"""End-to-end folder scan over FIXTURES.md-style delimited inputs."""

from __future__ import annotations

import pytest

from tests.fixture_data import N, write_fixture_folder
from whiterrabbit_spark.config import ScanConfig
from whiterrabbit_spark.report import write_tsv_report, write_xlsx_report
from whiterrabbit_spark.scan import scan_file, scan_folder


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scanfix")
    write_fixture_folder(d)
    return str(d)


def test_scan_folder_overview(spark, workdir):
    cfg = ScanConfig(exclude_cols=("excluded_col",), max_rows=-1)
    overview, results = scan_folder(spark, workdir, cfg)
    ov = {r["file_name"]: r.asDict() for r in overview.collect()}
    m = ov["profile_mixed.tsv"]
    assert m["n_rows"] == N + 1           # header-inclusive quirk (W:222/W:439)
    assert m["n_rows_checked"] == N
    assert m["n_fields"] == 9             # excluded col still counted (W:293-304)
    assert m["n_fields_empty"] == 1       # all_empty
    assert ov["tiny.tsv"]["n_rows"] == 3
    assert m["table"].startswith("File")


def test_scan_types_and_summary(spark, workdir):
    cfg = ScanConfig(exclude_cols=("excluded_col",), max_rows=-1)
    res = scan_file(spark, f"{workdir}/profile_mixed.tsv", cfg)
    t = res.inferred_types
    assert t["id"] == "double"
    assert t["age"] == "double"        # "" and literal NA fold to missing
    assert t["score"] == "double"
    assert t["almost_num"] == "string"  # 79% < 0.8 gate
    assert t["iso_date"] == "timestamp"
    assert t["gappy_date"] == "string"  # 25% empty ⇒ >20% missing quirk
    assert t["category"] == "string"
    summary = {r["column_name"]: r.asDict() for r in res.summary.collect()}
    assert "excluded_col" not in summary  # X1 exclusion from emitted summary
    assert summary["age"]["empty_count"] == 0     # folded into missing post-cast
    assert summary["age"]["missing_count"] == 16  # 8 "" + 8 literal NA
    assert summary["id"]["distinct_count"] == N
    assert summary["iso_date"]["earliest_val"] is not None


def test_scan_freq_present(spark, workdir):
    cfg = ScanConfig(max_rows=-1)
    res = scan_file(spark, f"{workdir}/profile_mixed.tsv", cfg)
    freq = {(r["column_name"], r["value"]): r["count"] for r in res.frequencies.collect()}
    assert any(k[0] == "category" for k in freq)
    assert not any(k[0] == "iso_date" for k in freq)  # date cols skipped


def test_sampling_caps_rows(spark, workdir):
    cfg = ScanConfig(max_rows=100)
    res = scan_file(spark, f"{workdir}/profile_mixed.tsv", cfg)
    assert res.n_rows_checked == 100
    assert res.total_rows == N + 1


def test_report_sinks(spark, workdir, tmp_path):
    cfg = ScanConfig(max_rows=-1)
    overview, results = scan_folder(spark, workdir, cfg)
    files = write_tsv_report(overview, results, str(tmp_path), "ScanReport")
    names = {f.split("/")[-1] for f in files}
    assert "ScanReport_Overview.tsv" in names
    assert "ScanReport_File1_Summary.tsv" in names
    assert "ScanReport_File1_Freq.tsv" in names
    assert "ScanReport_File2_Freq.tsv" not in names  # tiny.tsv: all counts < 5
    out = write_xlsx_report(overview, results, str(tmp_path), "ScanReport")
    from whiterrabbit_spark.xlsx import read_sheet_names

    names2 = read_sheet_names(out)
    assert "Overview" in names2 and "File1" in names2
    assert "File1freq" in names2 and "File2freq" not in names2


def test_shift_dates_bounded(spark, workdir):
    cfg = ScanConfig(max_rows=-1, shift_dates=True)
    plain = scan_file(spark, f"{workdir}/profile_mixed.tsv", ScanConfig(max_rows=-1))
    shifted = scan_file(spark, f"{workdir}/profile_mixed.tsv", cfg)
    p = {r["column_name"]: r.asDict() for r in plain.summary.collect()}
    s = {r["column_name"]: r.asDict() for r in shifted.summary.collect()}
    import datetime as dt

    fmt = "%Y-%m-%d %H:%M:%S"
    for stat in ("earliest_val", "latest_val"):
        delta = abs(
            dt.datetime.strptime(p["iso_date"][stat], fmt)
            - dt.datetime.strptime(s["iso_date"][stat], fmt)
        )
        assert delta <= dt.timedelta(days=5)


def test_header_only_file(spark, tmp_path):
    """0-data-row file: profile emits one row per column with zero counts;
    overview keeps the header-inclusive line count (n_rows=1)."""
    p = tmp_path / "empty.tsv"
    p.write_text("colA\tcolB\n")
    res = scan_file(spark, str(p), ScanConfig())
    assert res.total_rows == 1
    assert res.n_rows_checked == 0
    rows = {r.column_name: r for r in res.summary.collect()}
    assert set(rows) == {"colA", "colB"}
    for r in rows.values():
        assert r.total_count == 0
        assert r.distinct_count == 0
    assert res.frequencies is not None
    assert res.frequencies.count() == 0


def test_quoted_and_unicode_fields(spark, tmp_path):
    """Quoted fields with embedded delimiter/quotes and non-ASCII text
    survive the pinned quote/escape options."""
    p = tmp_path / "quoted.csv"
    p.write_text(
        'id,name,note\n'
        '1,"Ann Arbor, MI","said ""hi"""\n'
        '2,Ünïcødé ✓,plain\n'
        '3,"multi word",café\n'
    )
    res = scan_file(spark, str(p), ScanConfig(delimiter="comma"))
    rows = {r.column_name: r for r in res.summary.collect()}
    assert rows["name"].total_count == 3
    assert rows["name"].missing_count == 0
    assert rows["name"].distinct_count == 3
    assert rows["id"].data_type == "double"
    # values parsed, not split mid-quote
    from whiterrabbit_spark.io import read_all_string

    vals = {r["name"] for r in read_all_string(spark, str(p), ",").collect()}
    assert "Ann Arbor, MI" in vals
    assert "Ünïcødé ✓" in vals


def test_multiline_quoted_newlines(spark, tmp_path):
    p = tmp_path / "ml.csv"
    p.write_text(
        'id,note\n'
        '1,"line one\nline two"\n'
        '2,simple\n'
    )
    res = scan_file(spark, str(p), ScanConfig(delimiter="comma", multiline=True))
    rows = {r.column_name: r for r in res.summary.collect()}
    assert rows["note"].total_count == 2
    assert rows["id"].data_type == "double"
    from whiterrabbit_spark.io import read_all_string

    vals = {r["note"] for r in read_all_string(spark, str(p), ",", multiline=True).collect()}
    assert "line one\nline two" in vals
    # raw-line overview quirk preserved: wc -l counts 4 lines
    assert res.total_rows == 4


def test_duplicate_header_names(spark, tmp_path):
    p = tmp_path / "dup.tsv"
    p.write_text("x\ty\tx\n1\ta\t9\n2\tb\t8\n")
    res = scan_file(spark, str(p), ScanConfig())
    rows = {r.column_name: r for r in res.summary.collect()}
    assert set(rows) == {"x", "y", "x_2"}
    assert rows["x"].data_type == "double"
    assert rows["x_2"].data_type == "double"
    assert rows["x_2"].max_val == 9.0


def test_empty_field_vs_na_literal(spark, tmp_path):
    """fread semantics at the read layer (W:313-319): unquoted empty field
    → "" (EmptyCount), literal NA → NULL (MissingCount). Spark's csv parser
    folds both to NULL by default — the engine must keep them distinct."""
    p = tmp_path / "na.tsv"
    p.write_text("k\tv\n1\t\n2\tNA\n3\tx\n4\t\n")
    res = scan_file(spark, str(p), ScanConfig())
    r = {x.column_name: x for x in res.summary.collect()}["v"]
    assert r.empty_count == 2
    assert r.missing_count == 1
    assert r.non_missing_count == 1
    assert r.distinct_count == 1


def test_bom_header_stripped(spark, tmp_path):
    p = tmp_path / "bom.tsv"
    p.write_bytes("﻿id\tname\n1\ta\n2\tb\n".encode("utf-8"))
    res = scan_file(spark, str(p), ScanConfig())
    cols = {r.column_name for r in res.summary.collect()}
    assert cols == {"id", "name"}, cols


def test_ragged_rows(spark, tmp_path):
    """Short rows: absent trailing fields read as empty strings (fread
    fill=TRUE behavior for character columns); long rows: extras dropped."""
    p = tmp_path / "ragged.tsv"
    p.write_text("a\tb\tc\n1\tx\ty\n2\tx\n3\tx\ty\tEXTRA\n")
    res = scan_file(spark, str(p), ScanConfig())
    rows = {r.column_name: r for r in res.summary.collect()}
    assert rows["c"].total_count == 3
    assert rows["c"].empty_count == 1       # row 2's absent field
    assert rows["c"].missing_count == 0
    assert rows["a"].data_type == "double"


def test_xlsx_is_valid_ooxml(spark, workdir, tmp_path):
    """The hand-rolled xlsx (no openpyxl in this env) must be a valid zip
    of well-formed XML parts with the declared sheet inventory."""
    import xml.etree.ElementTree as ET
    import zipfile

    cfg = ScanConfig(max_rows=-1)
    overview, results = scan_folder(spark, workdir, cfg)
    path = write_xlsx_report(overview, results, str(tmp_path), "V")
    z = zipfile.ZipFile(path)
    assert z.testzip() is None
    names = z.namelist()
    assert "[Content_Types].xml" in names and "xl/workbook.xml" in names
    for n in names:
        if n.endswith(".xml"):
            ET.fromstring(z.read(n))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    sheets = [s.get("name") for s in wb.findall(".//m:sheet", ns)]
    assert sheets[0] == "Overview"
    assert any(s.startswith("File") for s in sheets[1:])


def test_profile_jsonl_source(spark, tmp_path):
    """Source interop: a JSONL corpus profiles through the same engine
    path as delimited/parquet tables."""
    import json as _json

    from whiterrabbit_spark.io import read_jsonl
    from whiterrabbit_spark.profile import profile_table

    p = tmp_path / "docs.jsonl"
    with open(p, "w") as fh:
        for i in range(100):
            fh.write(_json.dumps({
                "doc_id": i,
                "text": f"document number {i}",
                "score": i / 10.0,
            }) + "\n")
    df = read_jsonl(spark, str(p), "doc_id long, text string, score double")
    summary, _ = profile_table(df, ScanConfig(max_rows=-1), table_name="docs.jsonl")
    rows = {r.column_name: r for r in summary.collect()}
    assert rows["score"].total_count == 100
    assert rows["score"].max_val == 9.9
    assert abs(rows["score"].median_val - 4.95) < 1e-9
    assert rows["doc_id"].distinct_count == 100


def test_scan_jsonl_folder(spark, tmp_path):
    """JSONL folder profiles through the same pipeline: first-record keys
    become columns, values arrive stringified, inference types them, JSON
    null counts as missing."""
    import json

    d = tmp_path / "jl"
    d.mkdir()
    rows = [
        {"id": i, "score": i * 1.5, "day": f"2024-01-{(i % 9) + 1:02d}",
         "tag": f"t{i % 3}", "note": None if i % 5 == 0 else "ok"}
        for i in range(1, 41)
    ]
    (d / "data.jsonl").write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    cfg = ScanConfig(source_format="jsonl", max_rows=-1)
    overview, results = scan_folder(spark, str(d), cfg)
    ov = overview.collect()[0]
    assert ov["n_rows"] == 40          # every line a record, no header quirk
    assert ov["n_rows_checked"] == 40
    r = results[0]
    assert r.inferred_types["id"] == "double"
    assert r.inferred_types["score"] == "double"
    assert r.inferred_types["day"] == "timestamp"
    assert r.inferred_types["tag"] == "string"
    summ = {x["column_name"]: x for x in r.summary.collect()}
    assert summ["note"]["missing_count"] == 8
    assert summ["id"]["min_val"] == 1.0 and summ["id"]["max_val"] == 40.0


def test_scan_parquet_folder(spark, tmp_path):
    """Parquet folder: schema is authoritative (no inference), stats match
    the typed columns, N_rows is the row count (no header line)."""
    import shutil

    d = tmp_path / "pq"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/nation.parquet", d / "nation.parquet")
    shutil.copy("/root/testdata/sf0.001/region.parquet", d / "region.parquet")
    cfg = ScanConfig(source_format="parquet", max_rows=-1)
    overview, results = scan_folder(spark, str(d), cfg)
    by_name = {r.file_name: r for r in results}
    assert set(by_name) == {"nation.parquet", "region.parquet"}
    nation = by_name["nation.parquet"]
    assert nation.total_rows == 25
    types = nation.inferred_types
    assert types["n_name"] == "string"
    assert types["n_nationkey"] in ("bigint", "int", "long")
    summ = {x["column_name"]: x for x in nation.summary.collect()}
    assert summ["n_nationkey"]["min_val"] == 0.0
    assert summ["n_nationkey"]["max_val"] == 24.0
    assert summ["n_regionkey"]["distinct_count"] == 5


def test_discover_tables_bad_format(tmp_path):
    import pytest as _pytest

    from whiterrabbit_spark.io import discover_tables

    with _pytest.raises(ValueError, match="Unknown source_format"):
        discover_tables(str(tmp_path), source_format="avro")


def test_scan_parquet_sampling_caps_rows(spark, tmp_path):
    import shutil

    d = tmp_path / "pqs"
    d.mkdir()
    shutil.copy("/root/testdata/sf0.001/lineitem.parquet", d / "lineitem.parquet")
    cfg = ScanConfig(source_format="parquet", max_rows=500)
    overview, results = scan_folder(spark, str(d), cfg)
    r = results[0]
    assert r.n_rows_checked == 500
    assert r.total_rows > 500            # full row count still reported
    summ = {x["column_name"]: x for x in r.summary.collect()}
    assert summ["l_orderkey"]["total_count"] == 500


def test_scan_orc_folder_and_parquet_sink(spark, tmp_path):
    """ORC folder profiles like parquet (typed, no inference); the parquet
    report sink emits three readable datasets with per-file tags."""
    src = tmp_path / "orcsrc"
    out = tmp_path / "rep"
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").write.orc(
        str(src / "nation.orc")
    )
    cfg = ScanConfig(source_format="orc", max_rows=-1)
    overview, results = scan_folder(spark, str(src), cfg)
    r = results[0]
    assert r.total_rows == 25
    assert r.inferred_types["n_name"] == "string"
    summ = {x["column_name"]: x for x in r.summary.collect()}
    assert summ["n_regionkey"]["distinct_count"] == 5

    from whiterrabbit_spark.report import write_parquet_report

    paths = write_parquet_report(overview, results, str(out), "Scan")
    assert len(paths) == 3
    ov = spark.read.parquet(str(out / "Scan_overview"))
    assert ov.count() == 1
    summary = spark.read.parquet(str(out / "Scan_summary"))
    assert summary.count() == 3          # nation has 3 columns
    freqs = spark.read.parquet(str(out / "Scan_frequencies"))
    assert "table_name" in freqs.columns


def test_scan_gzip_tsv_and_malformed_jsonl(spark, tmp_path):
    """Gzipped delimited inputs profile transparently (header read, line
    count, inference); malformed JSONL lines null-fill instead of failing
    the scan."""
    import gzip
    import json

    d = tmp_path / "gz"
    d.mkdir()
    lines = ["id\tval"] + [f"{i}\t{i * 2}" for i in range(1, 31)]
    with gzip.open(d / "t.tsv.gz", "wt") as fh:
        fh.write("\n".join(lines) + "\n")
    overview, results = scan_folder(spark, str(d), ScanConfig(max_rows=-1))
    r = results[0]
    assert r.total_rows == 31            # header-inclusive quirk holds
    assert r.inferred_types["id"] == "double"
    summ = {x["column_name"]: x for x in r.summary.collect()}
    assert summ["val"]["max_val"] == 60.0

    j = tmp_path / "badjl"
    j.mkdir()
    rows = [json.dumps({"a": i, "b": f"x{i}"}) for i in range(10)]
    rows.insert(5, "{not valid json")
    (j / "data.jsonl").write_text("\n".join(rows) + "\n")
    cfg = ScanConfig(source_format="jsonl", max_rows=-1)
    _, jres = scan_folder(spark, str(j), cfg)
    jr = jres[0]
    assert jr.total_rows == 11
    summ = {x["column_name"]: x for x in jr.summary.collect()}
    assert summ["a"]["missing_count"] == 1   # the malformed line
    assert summ["a"]["non_missing_count"] == 10


def test_scan_txt_corpus_folder(spark, tmp_path):
    """Raw .txt corpora profile as single-column line-per-record tables:
    no header (N_rows == line count), text stays string, a numeral-only
    file types as double, and .txt.gz decompresses transparently."""
    import gzip

    d = tmp_path / "txtsrc"
    d.mkdir()
    (d / "prose.txt").write_text(
        "the quick brown fox\n" * 10 + "lazy dog lines\n" * 20
    )
    with gzip.open(d / "nums.txt.gz", "wt") as fh:
        fh.write("\n".join(str(i * 1.5) for i in range(40)) + "\n")

    cfg = ScanConfig(source_format="txt", max_rows=-1)
    overview, results = scan_folder(spark, str(d), cfg)
    by_name = {r.file_name: r for r in results}

    prose = by_name["prose.txt"]
    assert prose.total_rows == 30 and prose.n_rows_checked == 30
    assert prose.inferred_types == {"text": "string"}
    summ = {x["column_name"]: x for x in prose.summary.collect()}
    assert summ["text"]["distinct_count"] == 2
    freq = {x["value"]: x["count"] for x in prose.frequencies.collect()}
    assert freq["lazy dog lines"] == 20 and freq["the quick brown fox"] == 10

    nums = by_name["nums.txt.gz"]
    assert nums.inferred_types == {"text": "double"}
    nsumm = nums.summary.collect()[0]
    assert nsumm["min_val"] == 0.0 and nsumm["max_val"] == 58.5

    ov = {r["file_name"]: r for r in overview.collect()}
    assert ov["prose.txt"]["n_rows"] == 30  # no header line to count


def test_curate_cli_end_to_end(spark, tmp_path):
    """The curation CLI composes quality → dedup → decontam → split over a
    corpus with planted duplicates and a contaminated doc, writes a
    split-partitioned parquet corpus, and reports per-stage counts."""
    import json

    from whiterrabbit_spark import curate as cu

    good = (
        "the quick brown fox jumps over the lazy dog and that is a fine "
        "sentence with the usual words in it repeated the usual way. "
    ) * 3
    rows = [(i, good + f"unique tail {i}") for i in range(10)]
    rows.append((100, rows[0][1]))          # exact duplicate of doc 0
    rows.append((101, "x" * 10))            # low quality (too short, no stopwords)
    bench_text = "held out evaluation question about the capital of france answer paris"
    rows.append((102, good + bench_text))   # contaminated
    corpus_path = str(tmp_path / "corpus")
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(corpus_path)
    spark.createDataFrame(
        [(0, bench_text)], "qid long, text string"
    ).write.parquet(bench_path)

    out = str(tmp_path / "curated")
    report = str(tmp_path / "report.json")
    rc = cu.main([
        "-i", corpus_path, "-o", out,
        "--steps", "quality,dedup,decontam,split",
        "--bench", bench_path,
        "--overlap-threshold", "0.1",
        "--report", report,
    ])
    assert rc == 0
    rep = json.loads(open(report).read())
    assert rep["counts"]["input"] == 13
    assert rep["counts"]["quality"] == 12          # doc 101 dropped
    assert rep["counts"]["dedup"] == 11            # doc 100 collapsed into 0
    assert rep["counts"]["decontam"] == 10         # doc 102 dropped
    assert rep["counts"]["split"] == 10

    back = spark.read.parquet(out)
    assert sorted(r.doc_id for r in back.collect()) == list(range(10))
    assert set(back.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
    # split dirs are hive keys
    import os
    assert any(d.startswith("split=") for d in os.listdir(out))


def test_curate_cli_near_dedup(spark, tmp_path):
    """--dedup near collapses paraphrase-level near-duplicates (high
    Jaccard, different digests) that exact mode keeps."""
    from whiterrabbit_spark import curate as cu

    base = (
        "the quick brown fox jumps over the lazy dog and that is a fine "
        "long sentence with the usual words appearing in the usual way "
        "for a quality filter to like it very much indeed today "
    ) * 2
    rows = [
        (0, base + "original ending of the document"),
        (1, base + "slightly different ending of the document"),  # near-dup of 0
        (2, "completely different text about spark dataframes and shuffles "
            "that is long enough to pass the quality filter with the usual "
            "english stopwords the and of to a in is that " * 3),
    ]
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(corpus_path)
    out = str(tmp_path / "curated")
    report = str(tmp_path / "rep.json")
    rc = cu.main([
        "-i", corpus_path, "-o", out,
        "--steps", "dedup", "--dedup", "near", "--report", report,
    ])
    assert rc == 0
    kept = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert kept == [0, 2], kept


def test_curate_cli_normalize_step(spark, tmp_path):
    """--steps normalize,dedup: composed/decomposed encodings of the same
    text become exact duplicates and collapse; text is rewritten in
    canonical form."""
    from whiterrabbit_spark import curate as cu

    rows = [
        (0, "Café  du  Monde"),             # precomposed, double spaces
        (1, "Café du Monde"),              # combining accent
        (2, "something entirely different"),
    ]
    corpus_path = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(corpus_path)
    out = str(tmp_path / "curated")
    rc = cu.main([
        "-i", corpus_path, "-o", out, "--steps", "normalize,dedup",
    ])
    assert rc == 0
    back = {r.doc_id: r.text for r in spark.read.parquet(out).collect()}
    assert sorted(back) == [0, 2]
    assert back[0] == "café du monde"


def test_drift_report_cli(spark, tmp_path):
    """Snapshot drift CLI: matched files diff per column (type flips,
    stat deltas), one-sided files are listed."""
    import subprocess
    import sys

    a, b, out = tmp_path / "a", tmp_path / "b", tmp_path / "out"
    a.mkdir(); b.mkdir()
    (a / "t.tsv").write_text(
        "id\tval\tcat\n1\t1.5\tx\n2\t2.5\tx\n3\t3.5\ty\n")
    (b / "t.tsv").write_text(
        "id\tval\tcat\n1\t1.5\ty\n2\t9.5\ty\n4\thello\ty\n")
    (a / "gone.tsv").write_text("id\n1\n")

    from whiterrabbit_spark.config import ScanConfig
    from whiterrabbit_spark.drift import run_drift

    cfg = ScanConfig(max_rows=-1, scan_field_values=False)
    reports = run_drift(spark, str(a), str(b), cfg)
    assert set(reports) == {"t.tsv", "t.tsv::stats", "__only_old__"}
    rows = {r.column_name: r for r in reports["t.tsv"].collect()}
    assert rows["val"].type_changed is True        # double -> string ("hello")
    assert rows["val"].old_data_type == "double"
    assert rows["id"].type_changed is False
    assert rows["id"].delta_total_count == 0
    only_old = [r.file_name for r in reports["__only_old__"].collect()]
    assert only_old == ["gone.tsv"]
    # distributional tests run on SHARED same-typed columns only: id is
    # double on both sides (KS); val flipped double -> string, excluded
    stats = {(r.column_name, r.test): r for r in
             reports["t.tsv::stats"].collect()}
    assert set(stats) == {("id", "ks"), ("cat", "chi2")}
    assert abs(stats[("id", "ks")].stat - 1 / 3) < 1e-9  # {1,2,3} vs {1,2,4}
    assert stats[("cat", "chi2")].stat > 0 and stats[("cat", "chi2")].detail == 1


def test_read_all_string_quarantine(spark, tmp_path):
    from whiterrabbit_spark.io import read_all_string_quarantine

    p = tmp_path / "feed.tsv"
    p.write_text(
        "a\tb\tc\n"
        "1\tx\tNA\n"
        "2\ty\n"            # too few fields -> quarantined
        "3\tz\tok\textra\n"  # too many fields -> quarantined
        "4\t\tfine\n"
    )
    clean, bad = read_all_string_quarantine(spark, str(p), "\t")
    rows = {r.a: r for r in clean.collect()}
    assert sorted(rows) == ["1", "4"]
    assert rows["1"].c is None          # NA -> NULL
    assert rows["4"].b == ""            # empty stays empty
    bad_lines = sorted(r.raw_line for r in bad.collect())
    assert bad_lines == ["2\ty", "3\tz\tok\textra"]


def test_parquet_schema_report_and_merged_read(spark, tmp_path):
    from whiterrabbit_spark.io import (parquet_schema_report,
                                       read_parquet_folder_merged)

    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame(
        [(2, "b", 3.5)], "id long, name string, score double"
    )
    old.coalesce(1).write.parquet(str(tmp_path / "v1"))
    new.coalesce(1).write.parquet(str(tmp_path / "v2"))
    import glob as g
    import shutil
    dest = tmp_path / "lake"
    dest.mkdir()
    for i, f in enumerate(
        sorted(g.glob(str(tmp_path / "v*" / "*.parquet")))
    ):
        shutil.copy(f, dest / f"part-{i}.parquet")

    rep = parquet_schema_report(spark, str(dest)).collect()
    by_col = {}
    for r in rep:
        by_col.setdefault(r.column_name, []).append(r)
    assert len(by_col["id"]) == 2 and all(r.n_types == 1 for r in by_col["id"])
    assert len(by_col["score"]) == 1  # only the new file carries it

    merged = read_parquet_folder_merged(spark, str(dest))
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 3.5

    # type conflict surfaces as n_types > 1
    conflict = spark.createDataFrame([("x", "s")], "id string, name string")
    conflict.coalesce(1).write.parquet(str(tmp_path / "v3"))
    shutil.copy(
        sorted(g.glob(str(tmp_path / "v3" / "*.parquet")))[0],
        dest / "part-9.parquet",
    )
    rep2 = parquet_schema_report(spark, str(dest))
    id_types = {r.n_types for r in rep2.collect() if r.column_name == "id"}
    assert id_types == {2}


def test_cli_quarantine_flag(spark, tmp_path):
    import os

    from whiterrabbit_spark.cli import main

    wd = tmp_path / "in"
    od = tmp_path / "out"
    wd.mkdir(), od.mkdir()
    (wd / "feed.tsv").write_text(
        "a\tb\n1\tx\n2\ty\tz\textra\n3\tw\n"
    )
    rc = main([
        "-w", str(wd), "-o", str(od), "-f", "tsv", "-p", "Q",
        "--quarantine",
    ])
    assert rc == 0
    qfile = od / "Q_Quarantine_feed.tsv.txt"
    assert qfile.read_text() == "2\ty\tz\textra\n"
    # the malformed row is excluded from the profile
    summary = (od / "Q_File1_Summary.tsv").read_text()
    assert "\t2\t" in summary.splitlines()[1]  # total_count = 2 clean rows
    # without the flag no quarantine artifact appears and all rows profile
    od2 = tmp_path / "out2"
    od2.mkdir()
    rc = main(["-w", str(wd), "-o", str(od2), "-f", "tsv", "-p", "Q"])
    assert rc == 0
    assert not [f for f in os.listdir(od2) if "Quarantine" in f]


def test_quarantine_multiline_guard_and_sample_sizing(spark, tmp_path):
    """r2 advisor findings: --quarantine --multiline must raise via the
    reader's own guard (not silently parse line-wise), and with
    quarantine the exact-N sample sizes on SURVIVING rows so a
    heavily-malformed file still fills max_rows."""
    import pytest as _pytest

    from whiterrabbit_spark.config import ScanConfig
    from whiterrabbit_spark.scan import scan_file

    wd = tmp_path / "in"
    wd.mkdir()
    lines = ["a\tb"]
    for i in range(40):
        lines.append(f"{i}\tgood{i}")
        lines.append(f"{i}\tbad\textra\tfields")  # half the rows malformed
    p = wd / "feed.tsv"
    p.write_text("\n".join(lines) + "\n")

    with _pytest.raises(ValueError, match="multiline"):
        scan_file(
            spark, str(p),
            ScanConfig(quarantine_dir=str(tmp_path / "q1"), multiline=True),
        )

    # 80 data lines, 40 quarantined; max_rows=30 must still yield 30
    # sampled survivors (sizing on raw lines would undershoot)
    res = scan_file(
        spark, str(p),
        ScanConfig(quarantine_dir=str(tmp_path / "q2"), max_rows=30,
                   random_sample=True),
    )
    assert res.n_rows_checked == 30


def test_explain_cli(spark, capsys):
    import json

    from whiterrabbit_spark.explain import main

    assert main(["--list"]) == 0
    listed = capsys.readouterr().out.splitlines()
    assert any(l.startswith("summary_stats_lineitem") for l in listed)
    assert any("[rows-only]" in l for l in listed)

    assert main(["hist2d_lineitem"]) == 0
    out = capsys.readouterr().out
    assert "=== hist2d_lineitem ===" in out
    audit = json.loads(out.strip().splitlines()[-1])
    assert audit["query"] == "hist2d_lineitem" and audit["parquet_scans"] == 1

    assert main(["definitely_not_a_query"]) == 2


def test_incremental_scan_cache(spark, tmp_path):
    """Second run over an unchanged folder scans nothing; touching one
    file rescans only it; a deleted file is evicted; cached results
    equal fresh results."""
    import os
    import time

    from whiterrabbit_spark.config import ScanConfig
    from whiterrabbit_spark.incremental import scan_folder_incremental

    wd = tmp_path / "in"
    state = tmp_path / "state"
    wd.mkdir()
    (wd / "a.tsv").write_text("id\tval\n1\t10.5\n2\t11.5\n3\t\n")
    (wd / "b.tsv").write_text("k\tname\nx\talice\ny\tbob\n")
    cfg = ScanConfig()

    ov1, res1, rep1 = scan_folder_incremental(spark, str(wd), str(state), cfg)
    assert sorted(rep1.scanned) == ["a.tsv", "b.tsv"] and rep1.loaded == []
    snap1 = {
        r.file_name: sorted(tuple(x) for x in r.summary.collect())
        for r in res1
    }
    ov1_rows = sorted(tuple(r) for r in ov1.collect())

    ov2, res2, rep2 = scan_folder_incremental(spark, str(wd), str(state), cfg)
    assert rep2.scanned == [] and sorted(rep2.loaded) == ["a.tsv", "b.tsv"]
    snap2 = {
        r.file_name: sorted(tuple(x) for x in r.summary.collect())
        for r in res2
    }
    assert snap2 == snap1
    assert sorted(tuple(r) for r in ov2.collect()) == ov1_rows
    assert all(r.typed is None for r in res2)  # cached entries are frame-only

    # modify one file -> only it rescans, and its new content is reflected
    time.sleep(0.01)
    (wd / "a.tsv").write_text("id\tval\n1\t10.5\n2\t11.5\n3\t12.5\n4\t99.0\n")
    os.utime(wd / "a.tsv")
    ov3, res3, rep3 = scan_folder_incremental(spark, str(wd), str(state), cfg)
    assert rep3.scanned == ["a.tsv"] and rep3.loaded == ["b.tsv"]
    by_name = {r.file_name: r for r in res3}
    assert by_name["a.tsv"].total_rows == 5  # header-counted quirk intact
    a_summary = {r.column_name: r for r in by_name["a.tsv"].summary.collect()}
    assert a_summary["val"].total_count == 4

    # delete a file -> evicted from overview and cache
    (wd / "b.tsv").unlink()
    ov4, res4, rep4 = scan_folder_incremental(spark, str(wd), str(state), cfg)
    assert rep4.evicted == ["b.tsv"]
    assert [r.file_name for r in res4] == ["a.tsv"]
    assert ov4.count() == 1


def test_dataset_card_cli(spark, tmp_path, capsys):
    """Markdown dataset card over the sf0.001 documents corpus: volume,
    dup rate, quality/language sections present with sane numbers."""
    from whiterrabbit_spark.dataset_card import build_card, main

    card = build_card(spark, "/root/testdata/sf0.001/documents.parquet")
    assert "# Dataset card" in card
    assert "documents: **500**" in card
    assert "## Language mix" in card and "`en`" in card
    assert "## Top sources" in card
    assert "exact-duplicate rate" in card

    out = tmp_path / "card.md"
    rc = main(["--input", "/root/testdata/sf0.001/documents.parquet",
               "--out", str(out)])
    assert rc == 0 and out.read_text() == card

    # lang/source columns absent -> sections skipped, card still builds
    plain = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(6)], "doc_id long, text string"
    )
    p = str(tmp_path / "plain_pq")
    plain.write.parquet(p)
    card2 = build_card(spark, p)
    assert "## Language mix" not in card2 and "documents: **6**" in card2


def test_discover_cli(spark, tmp_path, capsys):
    """Join-discovery CLI over a small TSV folder: the FK pair tops the
    report, same-table pairs are excluded, TSV round-trips."""
    from whiterrabbit_spark.discover import main

    wd = tmp_path / "in"
    wd.mkdir()
    (wd / "cust.tsv").write_text(
        "cust_id\tsegment\n1\tA\n2\tB\n3\tA\n4\tC\n"
    )
    (wd / "ord.tsv").write_text(
        "order_id\tcust_ref\n100\t1\n101\t2\n102\t2\n103\t9\n"
    )
    out = tmp_path / "joins.tsv"
    rc = main(["-w", str(wd), "-o", str(out), "--min-containment", "0.4"])
    assert rc == 0
    lines = out.read_text().strip().split("\n")
    header, rows = lines[0], [l.split("\t") for l in lines[1:]]
    assert header.startswith("col_a\tcol_b")
    top = rows[0]
    assert top[0] == "cust.cust_id" and top[1] == "ord.cust_ref"
    assert top[4] == "2"  # values 1,2 overlap; 9 doesn't
    assert all(r[0].split(".")[0] != r[1].split(".")[0] for r in rows)

    # fewer than two tables -> error exit
    solo = tmp_path / "solo"
    solo.mkdir()
    (solo / "only.tsv").write_text("a\n1\n")
    assert main(["-w", str(solo)]) == 2


def test_discover_cli_dotted_table_names(spark, tmp_path):
    """Table names containing dots (dated/versioned files — io preserves
    dots in stems) must still pair cross-table; regression for the
    prefix-parsing exclusion that dropped them."""
    from whiterrabbit_spark.discover import main

    wd = tmp_path / "in"
    wd.mkdir()
    (wd / "sales.2024.tsv").write_text("id\tv\n1\ta\n2\tb\n")
    (wd / "sales.2025.tsv").write_text("ref\tw\n1\tx\n2\ty\n")
    out = tmp_path / "j.tsv"
    assert main(["-w", str(wd), "-o", str(out), "--min-containment", "0.5"]) == 0
    rows = [l.split("\t") for l in out.read_text().strip().split("\n")[1:]]
    assert any(
        r[0] == "sales.2024.id" and r[1] == "sales.2025.ref" for r in rows
    )


def test_incremental_scan_config_invalidation(spark, tmp_path):
    """A changed ScanConfig must invalidate the whole cache — cached
    results are only valid under the settings that produced them."""
    from whiterrabbit_spark.config import ScanConfig
    from whiterrabbit_spark.incremental import scan_folder_incremental

    wd = tmp_path / "in"
    state = tmp_path / "state"
    wd.mkdir()
    (wd / "a.tsv").write_text(
        "id\n" + "\n".join(str(i) for i in range(20)) + "\n"
    )
    _, res1, rep1 = scan_folder_incremental(
        spark, str(wd), str(state), ScanConfig(max_rows=5)
    )
    assert rep1.scanned == ["a.tsv"]
    _, _, rep2 = scan_folder_incremental(
        spark, str(wd), str(state), ScanConfig(max_rows=5)
    )
    assert rep2.loaded == ["a.tsv"]  # same config -> cache hit
    _, res3, rep3 = scan_folder_incremental(
        spark, str(wd), str(state), ScanConfig(max_rows=-1)
    )
    assert rep3.scanned == ["a.tsv"]  # config change -> full rescan
    s = {r.column_name: r for r in res3[0].summary.collect()}
    assert s["id"].total_count == 20  # profiled under the NEW config
