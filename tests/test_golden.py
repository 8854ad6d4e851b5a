"""Golden end-to-end regression: full scan of the fixture folder compared
byte-for-byte against checked-in report TSVs (SURVEY §5.3).

Regenerate after an intentional behavior change:
    WRS_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py -q
"""

from __future__ import annotations

import os
import pathlib

import pytest

from tests.fixture_data import write_fixture_folder
from whiterrabbit_spark.config import ScanConfig
from whiterrabbit_spark.report import write_tsv_report
from whiterrabbit_spark.scan import scan_folder

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def report_files(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("golden_src")
    out = tmp_path_factory.mktemp("golden_out")
    write_fixture_folder(src)
    cfg = ScanConfig(max_rows=-1, exclude_cols=("excluded_col",))
    overview, results = scan_folder(spark, str(src), cfg)
    return write_tsv_report(overview, results, str(out), "Golden")


def test_golden_reports(report_files):
    regen = os.environ.get("WRS_REGEN_GOLDEN") == "1"
    if regen:
        GOLDEN_DIR.mkdir(exist_ok=True)
    missing, diffs = [], []
    for path in report_files:
        name = os.path.basename(path)
        got = pathlib.Path(path).read_text()
        gold = GOLDEN_DIR / name
        if regen:
            gold.write_text(got)
            continue
        if not gold.exists():
            missing.append(name)
        elif gold.read_text() != got:
            diffs.append(name)
    assert not missing, f"goldens missing (regen with WRS_REGEN_GOLDEN=1): {missing}"
    assert not diffs, f"golden mismatch: {diffs}"
