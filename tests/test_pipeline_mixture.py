"""p15 repeat-factor mixture: hashlib twin + expectation properties."""

import hashlib

import pandas as pd

from tests.conftest import SF_SMOKE


def test_p15_repeat_factor_matches_python(spark):
    from aw3d30_parquet_spark.functions.pipeline import (
        REPEAT_RESOLUTION,
        repeat_factor_mixture,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[
        ["doc_id", "source"]
    ]
    n_total = len(docs)
    stats = docs.groupby("source").size().to_dict()
    weights = {s: int(s.replace("src", "")) + 1 for s in stats}
    w_total = sum(weights.values())
    res = REPEAT_RESOLUTION
    want = {}
    for s, n_s in stats.items():
        r = (weights[s] * n_total * res) // (w_total * n_s)
        emitted = 0
        for d in docs[docs.source == s]["doc_id"]:
            h = int(
                hashlib.md5(str(int(d)).encode()).hexdigest()[:15], 16
            )
            emitted += r // res + (1 if h % res < r % res else 0)
        want[s] = (n_s, r, emitted)
    rows = repeat_factor_mixture(spark, SF_SMOKE).collect()
    got = {r.source: (r.n_s, r.r_milli, r.n_emitted) for r in rows}
    assert got == want
    # expectation property: totals across sources stay within a few
    # percent of the corpus size (weights are a redistribution, not a
    # global up/down-scaling), and high-weight sources upsample while
    # low-weight ones downsample
    total_emitted = sum(e for _, _, e in got.values())
    assert abs(total_emitted - n_total) < 0.1 * n_total
    rs = {s: r for s, (_, r, _) in got.items()}
    assert rs["src19"] > res > rs["src0"]
