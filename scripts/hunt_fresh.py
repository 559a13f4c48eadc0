"""Fresh-seed differential mega-hunt vs the LIVE node reference.

Runs every generator from tests/test_node_differential.py at an arbitrary
base seed and batch size, so any suspicious fidelity claim can be
re-verified in one command (the differential twin of scripts/bench_one.py):

    python scripts/hunt_fresh.py [base_seed] [docs_per_generator]

Recorded round-4 sweeps, all zero-divergent: base 9,300,000 x 40,
base 9,700,000 x 100, base 10,200,000 x 60, and the continuation
sweeps through base 21M (combo generator included; four real catches,
all fixed and pinned).
"""

from __future__ import annotations

import pathlib
import random
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import tests.test_node_differential as m  # noqa: E402

PLAIN = [  # content-stream generators (wrapped by _assemble)
    ("soup", m._gen_stream),
    ("flush_scale", m._gen_flush_scale_stream),
    ("rise_space", m._gen_rise_space_stream),
    ("rotated", m._gen_rotated_stream),
    ("skew", m._gen_skew_stream),
    ("rotstate", m._gen_rotated_state_stream),
    ("tj_coalesce", m._gen_tj_coalesce_stream),
    ("bigtc", m._gen_bigtc_stream),
    ("clipseg", m._gen_clipseg_stream),
    ("combo", m._gen_combo_stream),
    ("skew_tz", m._gen_skew_tz_stream),
    ("coerce", m._gen_coerce_stream),
    ("inline_image", m._gen_inline_image_stream),
    ("content_ref", m._gen_ref_stream),
    ("numlex", m._gen_numlex_stream),
]
FULL = [  # generators that emit complete PDF documents
    ("tzneg", m._gen_tzneg_stream),
    ("zwreg", m._gen_zwreg_stream),
    ("allzw", m._gen_allzw_stream),
    ("arity", m._gen_arity_stream),
    ("nzreg", m._gen_nzreg_stream),
    ("form_inherit", m._gen_form_inherit_stream),
    ("rise_bt", m._gen_rise_bt_stream),
    ("qq", m._gen_qq_stream),
    ("form_lm", m._gen_form_lm_stream),
    ("form_lm_edge", m._gen_form_lm_edge_stream),
    ("form_combo", m._gen_form_combo_stream),
    ("coerce_form", m._gen_coerce_form_stream),
    ("cross_page", m._gen_cross_page_cache_stream),
    ("font_chaos", m._gen_font_chaos_stream),
    ("lexmix", m._gen_lexmix_stream),
    ("split_contents", m._gen_split_contents_stream),
    ("type0", m._gen_type0_stream),
]


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 9_300_000
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    plain_names = {name for name, _ in PLAIN}
    fails = 0
    for i, (name, gen) in enumerate(PLAIN + FULL):
        docs = []
        for s in range(n):
            out = gen(random.Random(base + i * 10_000 + s))
            if name in plain_names:
                out = m._assemble(out)
            docs.append(out)
        with tempfile.TemporaryDirectory() as td:
            try:
                m._run_differential(pathlib.Path(td), docs)
                print(f"OK   {name}: {len(docs)} docs byte-equal")
            except AssertionError as e:
                fails += 1
                print(f"DIVERGE {name}: {str(e)[:400]}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
