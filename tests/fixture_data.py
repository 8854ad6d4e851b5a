"""Deterministic FIXTURES.md-style delimited fixture (shared by e2e and
golden tests)."""

from __future__ import annotations

import random

N = 400


def mixed_rows() -> list[dict[str, str]]:
    rng = random.Random(7)
    rows = []
    for i in range(N):
        rows.append(
            {
                "id": str(i + 1),
                "age": "" if i % 50 == 0 else ("NA" if i % 50 == 1 else str(18 + i % 70)),
                "score": f"{rng.uniform(-10, 10):.3f}" if i % 100 else "1.5e3",
                "almost_num": str(i) if i % 100 < 79 else f"x{i}",
                "iso_date": f"2021-{i % 12 + 1:02d}-{i % 28 + 1:02d}",
                "gappy_date": "" if i % 4 == 0 else f"2022-{i % 12 + 1:02d}-{i % 28 + 1:02d}",
                "category": ["alpha", "beta", "gamma", "alpha", "alpha", "beta", "delta", "rare1"][i % 8] if i % 8 != 7 or i < 32 else "tail",
                "all_empty": "",
                "excluded_col": f"e{i}",
            }
        )
    return rows


def write_fixture_folder(dirpath) -> None:
    rows = mixed_rows()
    cols = list(rows[0].keys())
    with open(f"{dirpath}/profile_mixed.tsv", "w") as fh:
        fh.write("\t".join(cols) + "\n")
        for r in rows:
            fh.write("\t".join(r[c] for c in cols) + "\n")
    with open(f"{dirpath}/tiny.tsv", "w") as fh:
        fh.write("a\tb\n1\tx\n2\ty\n")
