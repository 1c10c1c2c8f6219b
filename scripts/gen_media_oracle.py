"""Regenerate the embedded media_features oracle table in
``__spark_entry__.py``.

The expected features are computed by a deliberately INDEPENDENT
implementation of the feature math (plain per-row Python loops, no
reduceat, no vectorization) over the same seeded fake payload generator
``multimodal.synthetic_media`` uses — so the Spark path and the oracle
share only the input definition, not the computation.

Run ``python scripts/gen_media_oracle.py`` after changing the synthetic
media generator or the feature definitions, then paste the printed block
over the ``media_features`` entry in ``oracle_sql()``.
"""
import numpy as np

GOLDEN = 0x9E3779B97F4A7C15
M = 1 << 64


def expected_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        size = 256 + int(rng.integers(0, 1024))
        payload = rng.integers(0, 256, size, dtype=np.uint8)
        s = 0
        feat = 0
        for b in payload.tolist():
            s += b
            feat ^= (b * GOLDEN) % M
        if feat >= 1 << 63:
            feat -= M
        rows.append((i, size, s // size, feat))
    return rows


if __name__ == "__main__":
    vals = ",\n        ".join(f"({i}, {nb}, {bm}, {fh})"
                              for i, nb, bm, fh in expected_rows())
    print('        "media_features": """')
    print('            SELECT media_id, n_bytes, byte_mean, feat_hash')
    print('            FROM (VALUES\n        ' + vals + ') AS')
    print('            t(media_id, n_bytes, byte_mean, feat_hash)""",')
