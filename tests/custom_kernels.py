"""Importable custom kernels for the pagerenderModule-analog tests
(reference test/examples/custom-render-module.js:10-41 — must be a module
attribute, not a closure, so executors can import it)."""

from __future__ import annotations

import pandas as pd

from pdf_parse_new_spark import kernels


def upper_kernel(texts: pd.Series) -> pd.DataFrame:
    out = kernels.extract_batch(texts)
    out["extracted_text"] = out["extracted_text"].str.upper()
    return out


def constant_kernel(texts: pd.Series) -> pd.DataFrame:
    out = kernels.extract_batch(texts)
    out["extracted_text"] = "CONSTANT"
    return out
