"""COVERAGE.md totals guard (VERDICT r04 #2: the totals line went
stale two rounds running — make drift a test FAILURE, not a judge
finding).  The claimed registry size and collected-test count are
parsed out of the prose and compared against reality."""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
COVERAGE = (REPO / "COVERAGE.md").read_text()


def test_coverage_registry_totals_match_live_registry():
    from etl_pulumi_aws_snowflake_spark.queries import all_oracles, all_queries

    m = re.search(r"Totals: (\d+) `queries\(\)` entries, (\d+) with", COVERAGE)
    assert m, "COVERAGE.md totals line not found / reworded"
    assert int(m.group(1)) == len(all_queries())
    assert int(m.group(2)) == len(all_oracles())


def test_coverage_pytest_totals_match_collection():
    m = re.search(r"(\d+) pytest checks\s+collected", COVERAGE)
    assert m, "COVERAGE.md pytest-totals phrase not found / reworded"
    out = subprocess.run(
        [sys.executable, "-m", "pytest", str(REPO / "tests"), "--collect-only", "-q"],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    tail = re.search(r"(\d+) tests collected", out.stdout)
    assert tail, f"could not parse collect-only output:\n{out.stdout[-500:]}"
    assert int(m.group(1)) == int(tail.group(1)), (
        f"COVERAGE.md claims {m.group(1)} collected checks but pytest "
        f"collects {tail.group(1)} — refresh the totals line"
    )


def test_driver_window_names_are_real_and_unique():
    """_DRIVER_FIRST is applied with `if k in d`, so a typo'd or renamed
    entry silently falls out of the 50-slot driver window instead of
    failing — the rotation would quietly check the wrong queries."""
    from etl_pulumi_aws_snowflake_spark.queries import _DRIVER_FIRST, all_queries

    names = set(all_queries())
    unknown = [n for n in _DRIVER_FIRST if n not in names]
    assert not unknown, f"_DRIVER_FIRST names not in registry: {unknown}"
    dupes = [n for n in set(_DRIVER_FIRST) if _DRIVER_FIRST.count(n) > 1]
    assert not dupes, f"_DRIVER_FIRST duplicates: {dupes}"
    assert len(_DRIVER_FIRST) == 50, (
        f"driver window holds exactly 50 slots, got {len(_DRIVER_FIRST)}"
    )


def test_never_driver_checked_entries_lead_the_window():
    """The r05 process miss (three late-round registry additions landed
    outside the 50-slot driver window and were never driver-checked):
    every registry entry with NO CORRECTNESS row must sit in the first
    50 of all_queries(), so adding an entry without rotating the window
    is a test failure, not a judge finding."""
    sys.path.insert(0, str(REPO / "scripts"))
    import driver_staleness as ds

    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    evidence = ds.latest_evidence()
    window = list(all_queries())[:50]
    missed = [
        n for n in all_queries() if n not in evidence and n not in window
    ]
    assert not missed, (
        f"registry entries without driver evidence sit OUTSIDE the "
        f"50-slot driver window: {missed} — rotate _DRIVER_FIRST "
        "(scripts/driver_staleness.py prints the candidates)"
    )


def test_staleness_report_covers_every_entry():
    """scripts/driver_staleness.py feeds the window rotation; its
    evidence map must parse every CORRECTNESS file and each green row
    must reflect the hash verdict, or the rotation plans from bad data."""
    sys.path.insert(0, str(REPO / "scripts"))
    import driver_staleness as ds

    evidence = ds.latest_evidence()
    assert evidence, "no CORRECTNESS_r*.json parsed"
    # every recorded row names a real (current or historical) query and
    # carries a (round, green) verdict
    for name, (rnd, green) in evidence.items():
        assert rnd >= 1
        assert isinstance(green, bool)
    # spot-pin against a known file: round 4 contained these as green
    assert evidence["pipeline_batch_e2e"][1] is True
    assert evidence["q1_pricing_summary"][0] >= 1


def test_scale_md_curve_table_matches_report():
    """VERDICT r09 #2: SCALE.md's round-9 scale-curve table silently
    diverged from the committed scripts/scale_curve_report.json (5 of 7
    ops, numbers from an earlier run, a conclusion the report
    contradicts).  The doc table is now framed by markers and must
    equal the table regenerated verbatim from the committed report —
    any drift (op added/dropped, number edited, rerun not propagated)
    fails here instead of surfacing as a judge finding."""
    import json

    sys.path.insert(0, str(REPO / "scripts"))
    import scale_curve

    scale = (REPO / "SCALE.md").read_text()
    m = re.search(
        r"<!-- SCALE_CURVE_TABLE_BEGIN -->.*?<!-- SCALE_CURVE_TABLE_END -->",
        scale,
        re.S,
    )
    assert m, "SCALE.md scale-curve table markers missing"
    report = json.loads(
        (REPO / "scripts" / "scale_curve_report.json").read_text()
    )
    assert m.group(0) == scale_curve.curve_table(report), (
        "SCALE.md scale-curve table differs from the committed report — "
        "regenerate it with scripts/scale_curve.curve_table()"
    )


def test_coverage_smoke_sweep_matches_artifact():
    """VERDICT r10 #1c: the 'mirror-green at sf0.001' paragraph went
    stale at 130 while the registry grew — pin its count to the
    committed smoke-sweep artifact AND require the artifact to cover
    the live registry, so adding an entry without re-sweeping fails
    here instead of surfacing as a judge finding."""
    import json

    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    m = re.search(r"all (\d+) entries are also mirror-green at sf0\.001",
                  COVERAGE)
    assert m, "COVERAGE.md smoke-sweep phrase not found / reworded"
    rep = json.loads(
        (REPO / "scripts" / "smoke_mirror_report.json").read_text()
    )
    meta = rep.pop("_meta")
    assert meta["sf_dir"].rstrip("/").endswith("sf0.001")
    assert set(rep) == set(all_queries()), (
        "smoke sweep artifact does not cover the live registry — "
        "re-run scripts/driver_mirror.py 0 /root/testdata/sf0.001 "
        "smoke_mirror_report.json"
    )
    not_ok = sorted(k for k, v in rep.items() if not v.get("ok"))
    assert not not_ok, f"smoke sweep has failures: {not_ok}"
    assert int(m.group(1)) == len(rep)


def test_coverage_partition_invariance_matches_artifact():
    """Same guard for the partition-invariance paragraph: count pinned
    to scripts/determinism_report.json, artifact must cover the live
    registry, zero unstable."""
    import json

    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    m = re.search(
        r"ALL (\d+) entries produce canonically identical", COVERAGE
    )
    assert m, "COVERAGE.md partition-invariance phrase not found / reworded"
    rep = json.loads(
        (REPO / "scripts" / "determinism_report.json").read_text()
    )
    assert rep["unstable"] == [], rep["unstable"]
    assert set(rep["names"]) == set(all_queries()), (
        "determinism artifact does not cover the live registry — "
        "re-run scripts/determinism_check.py <registry size>"
    )
    assert int(m.group(1)) == rep["stable"] == rep["checked"]


def test_driver_mirror_artifact_covers_registry():
    """The sf0.01 mirror artifact (the local replica of the driver)
    must cover every live entry and be all-green — VERDICT r10 #1a
    found it two entries behind."""
    import json

    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    rep = json.loads(
        (REPO / "scripts" / "driver_mirror_report.json").read_text()
    )
    rep.pop("_meta", None)
    assert set(rep) == set(all_queries()), (
        "mirror artifact does not cover the live registry — re-run "
        "scripts/driver_mirror.py"
    )
    not_ok = sorted(k for k, v in rep.items() if not v.get("ok"))
    assert not not_ok, f"mirror has failures: {not_ok}"


def test_bench_report_not_drifted_in_working_tree():
    """VERDICT r15 #8 / r16 #5 (recurring): the external driver's
    post-session official bench run rewrites scripts/bench_report.json
    and has repeatedly been left modified in the working tree, so the
    committed report silently stopped being the run the round's
    BENCH_r{N}.json recorded.  This gate fails the NEXT session's
    first pytest while the file sits dirty: if the dirty content
    compact-line-matches the latest BENCH_r{N}.json artifact it IS the
    driver's official run — commit it as-is; anything else needs
    investigating before committing."""
    import json

    import bench

    st = subprocess.run(
        ["git", "status", "--porcelain", "--", "scripts/bench_report.json"],
        capture_output=True, text=True, cwd=REPO,
    )
    if st.returncode != 0:
        pytest.skip("git unavailable")
    if not st.stdout.strip():
        return  # committed — no drift
    arts = sorted(
        REPO.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    hint = "no BENCH_r{N}.json artifacts exist to compare against"
    if arts:
        parsed = json.loads(arts[-1].read_text()).get("parsed") or {}
        doc = json.loads(
            (REPO / "scripts" / "bench_report.json").read_text()
        )
        line = json.loads(bench.compact_line(doc))
        parsed.pop("report", None)
        line.pop("report", None)
        hint = (
            f"its compact line MATCHES {arts[-1].name} — this is the "
            "driver's official run; commit it as-is"
            if line == parsed
            else f"its compact line does NOT match {arts[-1].name} — "
            "investigate which run this is before committing"
        )
    raise AssertionError(
        "scripts/bench_report.json is modified in the working tree "
        f"({hint})"
    )


def test_bench_report_committed_and_compact_line_fits_driver_tail():
    """VERDICT r12 #1: the driver's BENCH_r{N}.json keeps only a
    2000-char stdout tail, and r12's full bench doc overflowed it —
    the round artifact lost the headline total.  The committed full
    report must cover bench.HEADLINE against the live registry, and the
    compact stdout line rebuilt from it must stay under the tail
    window (with margin for timing-digit jitter)."""
    import json

    import bench

    from etl_pulumi_aws_snowflake_spark.queries import all_queries

    doc = json.loads((REPO / "scripts" / "bench_report.json").read_text())
    # replicate bench.main()'s run order: shared first, builders last
    present = [n for n in bench.HEADLINE if n in all_queries()]
    expected = [n for n in present if n not in bench.BUILD_INCLUSIVE] + [
        n for n in present if n in bench.BUILD_INCLUSIVE
    ]
    assert list(doc["queries"]) == expected, (
        "scripts/bench_report.json does not match bench.HEADLINE over "
        "the live registry — re-run `python bench.py` and commit the "
        "refreshed report"
    )
    assert set(doc["queries_median"]) == set(doc["queries"])
    for key in ("metric", "value", "serve_only_total", "unit",
                "calibration", "build_inclusive", "rebaselined", "sf"):
        assert key in doc, f"bench report missing {key!r}"
    # serve_only_total (VERDICT r13 #7) = headline minus the
    # build-inclusive rows, recomputable from the committed doc
    assert doc["serve_only_total"] == round(
        sum(
            v for n, v in doc["queries"].items()
            if n not in doc["build_inclusive"]
        ),
        4,
    )
    line = bench.compact_line(doc)
    assert len(line) < 1900, (
        f"bench compact stdout line is {len(line)} chars — the driver "
        "records a 2000-char tail; trim the headline set or the line "
        "format before this overflows the round artifact again"
    )
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert set(parsed["queries"]) == set(doc["queries"])
