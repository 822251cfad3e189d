"""Data skipping over delta per-file stats (sources/deltastats.py):
parser subset boundaries, pruning soundness (never skip a file that
could match), partition-value pruning, and conservative fallbacks."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from opencode_hive_archon_spark.sources import deltalog as dl
from opencode_hive_archon_spark.sources import deltastats as ds


def _banded_table(spark, tmp_path, bands=((0, 10), (10, 20), (20, 30))):
    tbl = str(tmp_path / "t")
    for lo, hi in bands:
        dl.delta_write(
            spark,
            spark.range(lo, hi).select(F.col("id").alias("k")).repartition(1),
            tbl,
        )
    return tbl


def test_parser_supported_subset():
    p = ds.parse_skipping_predicate
    assert p("k >= 5") == ("atom", "k", ">=", 5.0)
    assert p("5 <= k") == ("atom", "k", ">=", 5.0)  # literal-first flips
    assert p("k == 5") == ("atom", "k", "=", 5.0)
    assert p("k <> 5") == ("atom", "k", "!=", 5.0)
    assert p("k >= 5 AND k < 7")[0] == "and"
    assert p("(k < 2 OR k > 25) AND k != 9")[0] == "and"
    # Null atoms and string literals (r16): inside the subset now.
    assert p("k IS NULL") == ("null", "k", False)
    assert p("k IS NOT NULL") == ("null", "k", True)
    assert p("name = 'x'") == ("atom", "name", "=", "x")
    assert p("'x' <= name") == ("atom", "name", ">=", "x")
    assert p("note = 'it''s'") == ("atom", "note", "=", "it's")
    assert p("k IS NULL OR name > 'm'")[0] == "or"
    # Outside the subset -> None (fallback to scan-all), never a guess.
    assert p("NOT k = 5") is None
    assert p("k IS") is None
    assert p("k IS NOT") is None
    assert p("k BETWEEN 1 AND 2") is None
    assert p("name LIKE 'x%'") is None
    assert p("k + 1 > 5") is None
    assert p("") is None
    assert p("k >") is None


def test_add_actions_carry_min_max_stats(spark, tmp_path):
    tbl = _banded_table(spark, tmp_path)
    files = dl._snapshot_state(spark, tbl)["files"]
    stats = [json.loads(f["stats"]) for f in files]
    ks = sorted((s["minValues"]["k"], s["maxValues"]["k"]) for s in stats)
    assert ks == [(0, 9), (10, 19), (20, 29)]
    assert all(s["nullCount"]["k"] == 0 for s in stats)


def test_scan_prunes_files_and_matches_plain_filter(spark, tmp_path):
    tbl = _banded_table(spark, tmp_path)
    total, scanned = ds.delta_scan_accounting(spark, tbl, "k >= 10 AND k < 20")
    assert (total, scanned) == (3, 1)
    got = sorted(
        r["k"] for r in ds.delta_scan(spark, tbl, "k >= 10 AND k < 20").collect()
    )
    assert got == list(range(10, 20))
    # OR prunes only when every branch does; boundary atoms stay sound.
    total, scanned = ds.delta_scan_accounting(spark, tbl, "k < 5 OR k >= 25")
    assert (total, scanned) == (3, 2)
    total, scanned = ds.delta_scan_accounting(spark, tbl, "k = 9")
    assert (total, scanned) == (3, 1)
    total, scanned = ds.delta_scan_accounting(spark, tbl, "k = 10")
    assert (total, scanned) == (3, 1)
    # Unsupported shape: all files kept, result still exact.
    total, scanned = ds.delta_scan_accounting(spark, tbl, "k % 10 = 3")
    assert (total, scanned) == (3, 3)
    got = sorted(r["k"] for r in ds.delta_scan(spark, tbl, "k % 10 = 3").collect())
    assert got == [3, 13, 23]


def test_soundness_exhaustive_vs_plain_filter(spark, tmp_path):
    """Every supported predicate shape over every band boundary: pruning
    must NEVER change the result set (the soundness contract)."""
    tbl = _banded_table(spark, tmp_path)
    snap = dl.delta_snapshot(spark, tbl)
    for op in ("<", "<=", ">", ">=", "=", "!="):
        for lit in (0, 9, 10, 15, 29, 30, -1):
            pred = f"k {op} {lit}"
            want = sorted(r["k"] for r in snap.filter(pred).collect())
            got = sorted(
                r["k"] for r in ds.delta_scan(spark, tbl, pred).collect()
            )
            assert got == want, pred


def test_partition_value_pruning(spark, tmp_path):
    tbl = str(tmp_path / "t")
    df = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("bucket")
    )
    dl.delta_write(spark, df, tbl, partition_by=["bucket"])
    total, scanned = ds.delta_scan_accounting(spark, tbl, "bucket = 1")
    assert scanned < total
    got = sorted(r["k"] for r in ds.delta_scan(spark, tbl, "bucket = 1").collect())
    assert got == [k for k in range(30) if k % 3 == 1]


def test_missing_stats_keep_file(spark, tmp_path):
    """A foreign add without stats can never be skipped."""
    tbl = _banded_table(spark, tmp_path, bands=((0, 10),))
    state = dl._snapshot_state(spark, tbl)
    bare = [dict(f, stats=None) for f in state["files"]]
    assert ds.prune_files(dict(state, files=bare), "k > 999") == bare


def test_string_columns_indexed_with_sound_truncation(spark, tmp_path):
    """r16: string columns ARE indexed — short values exactly, long
    maxima via the truncate-plus-prefix-successor rule (the widened
    bound must stay ≥ every value in the file)."""
    tbl = str(tmp_path / "t")
    long_max = "zebra" * 30
    df = spark.createDataFrame(
        [(1, "aa"), (2, long_max)], "k long, s string"
    ).repartition(1)
    dl.delta_write(spark, df, tbl)
    stats = json.loads(dl._snapshot_state(spark, tbl)["files"][0]["stats"])
    assert stats["minValues"]["s"] == "aa"
    hi = stats["maxValues"]["s"]
    assert len(hi) <= dl._STATS_STRING_PREFIX
    assert hi > long_max  # widened successor, not an unsound prefix
    # And the scan built on those bounds prunes/keeps correctly.
    dl.delta_write(
        spark,
        spark.createDataFrame([(3, "mm")], "k long, s string"),
        tbl, mode="append",
    )
    snap = dl.delta_snapshot(spark, tbl)
    for pred in ("s > 'z'", "s < 'ab'", "s = 'mm'", "s >= 'zebrazebraz'"):
        want = sorted(r["k"] for r in snap.filter(pred).collect())
        got = sorted(r["k"] for r in ds.delta_scan(spark, tbl, pred).collect())
        assert got == want, pred


def test_prefix_successor_edge_cases():
    assert dl._prefix_successor("abc") == "abd"
    assert dl._prefix_successor("ab" + chr(0x10FFFF)) == "ac"
    assert dl._prefix_successor(chr(0x10FFFF) * 3) is None
    # Surrogate block is skipped so the bound stays JSON/UTF-8 clean.
    assert dl._prefix_successor(chr(0xD7FF)) == chr(0xE000)
    succ = dl._prefix_successor("ab")
    assert succ is not None and succ > "ab" + "z" * 100


def test_null_skipping_soundness(spark, tmp_path):
    """VERDICT r15 #1 done-criteria: null-only file skipped for IS NOT
    NULL, no-null file skipped for IS NULL, mixed file kept for both —
    and results always equal the plain filter."""
    tbl = str(tmp_path / "t")
    rows = {
        "allnull": [(1, None), (2, None)],
        "nonull": [(3, 30.0), (4, 40.0)],
        "mixed": [(5, None), (6, 60.0)],
    }
    for vals in rows.values():
        dl.delta_write(
            spark,
            spark.createDataFrame(vals, "k long, x double").repartition(1),
            tbl, mode="append",
        )
    # The all-null file still carries an exact nullCount (no bounds).
    stats = [
        json.loads(f["stats"])
        for f in dl._snapshot_state(spark, tbl)["files"]
    ]
    allnull = next(s for s in stats if s["nullCount"].get("x") == 2)
    assert "x" not in (allnull.get("minValues") or {})
    snap = dl.delta_snapshot(spark, tbl)
    total, scanned = ds.delta_scan_accounting(spark, tbl, "x IS NOT NULL")
    assert (total, scanned) == (3, 2)  # all-null file skipped
    total, scanned = ds.delta_scan_accounting(spark, tbl, "x IS NULL")
    assert (total, scanned) == (3, 2)  # no-null file skipped
    for pred in ("x IS NULL", "x IS NOT NULL",
                 "x IS NOT NULL AND x > 35", "x IS NULL OR x > 55"):
        want = sorted(r["k"] for r in snap.filter(pred).collect())
        got = sorted(r["k"] for r in ds.delta_scan(spark, tbl, pred).collect())
        assert got == want, pred


def test_null_partition_value_pruning(spark, tmp_path):
    """A NULL partition value lands in __HIVE_DEFAULT_PARTITION__; IS
    NULL keeps only that partition's files, comparisons skip them."""
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "k long, p string"
    )
    dl.delta_write(spark, df, tbl, partition_by=["p"])
    snap = dl.delta_snapshot(spark, tbl)
    for pred in ("p IS NULL", "p IS NOT NULL", "p = 'a'", "p > 'a'"):
        want = sorted(r["k"] for r in snap.filter(pred).collect())
        got = sorted(r["k"] for r in ds.delta_scan(spark, tbl, pred).collect())
        assert got == want, pred
    total, scanned = ds.delta_scan_accounting(spark, tbl, "p IS NULL")
    assert scanned < total
    total, scanned = ds.delta_scan_accounting(spark, tbl, "p = 'a'")
    assert scanned < total


def test_string_skipping_soundness_exhaustive(spark, tmp_path):
    """String mirror of test_soundness_exhaustive_vs_plain_filter:
    banded string files, every supported op over boundary literals,
    pruned result must equal the plain filter."""
    tbl = str(tmp_path / "t")
    bands = (("aaa", "ammo", "azz"), ("baa", "bmm", "bzz"),
             ("caa", "c" + "z" * 60, "czz"))
    for i, band in enumerate(bands):
        dl.delta_write(
            spark,
            spark.createDataFrame(
                [(i * 10 + j, s) for j, s in enumerate(band)],
                "k long, s string",
            ).repartition(1),
            tbl, mode="append",
        )
    snap = dl.delta_snapshot(spark, tbl)
    for op in ("<", "<=", ">", ">=", "=", "!="):
        for lit in ("aaa", "azz", "b", "bmm", "czz", "zzz", ""):
            pred = f"s {op} '{lit}'"
            want = sorted(r["k"] for r in snap.filter(pred).collect())
            got = sorted(
                r["k"] for r in ds.delta_scan(spark, tbl, pred).collect()
            )
            assert got == want, pred
    total, scanned = ds.delta_scan_accounting(spark, tbl, "s = 'bmm'")
    assert (total, scanned) == (3, 1)
    total, scanned = ds.delta_scan_accounting(spark, tbl, "s < 'b'")
    assert (total, scanned) == (3, 1)


def test_append_retry_stages_once_and_wins_next_version(spark, tmp_path):
    """delta_append loses a commit race (the next version file already
    exists) and must retry at the following version WITHOUT duplicating
    rows — the staged files are committed exactly once."""
    tbl = str(tmp_path / "t")
    dl.delta_write(
        spark, spark.range(0, 5).select(F.col("id").alias("k")), tbl
    )
    # Occupy v1, as a racing writer would (a valid no-data commit).
    dl._commit(tbl, 1, [{
        "commitInfo": {"timestamp": 0, "operation": "WRITE",
                       "operationParameters": {"mode": "APPEND"}},
    }])
    v = dl.delta_append(
        spark,
        spark.range(5, 8).select(F.col("id").alias("k")).repartition(1),
        tbl,
    )
    assert v == 2
    assert sorted(r["k"] for r in dl.delta_snapshot(spark, tbl).collect()) == [
        0, 1, 2, 3, 4, 5, 6, 7
    ]
    # Exactly one data file was staged for the retried append.
    with open(dl._version_file(tbl, 2)) as fh:
        adds = [json.loads(l) for l in fh if l.strip() and "add" in l]
    assert len([a for a in adds if "add" in a]) == 1


def test_append_retry_creates_table_and_enforces_schema(spark, tmp_path):
    tbl = str(tmp_path / "t")
    v = dl.delta_append(
        spark, spark.range(0, 3).select(F.col("id").alias("k")), tbl
    )
    assert v == 0
    with pytest.raises(dl.DeltaProtocolError, match="schema enforcement"):
        dl.delta_append(
            spark,
            spark.range(0, 3).select(F.col("id").alias("other")),
            tbl,
        )


def test_delete_discovery_is_stats_pruned_and_exact(spark, tmp_path):
    """DELETE runs its hit-discovery over the stats-pruned candidate set;
    band-boundary predicates (supported shape) and modulo predicates
    (unsupported shape -> full scan) must both delete exactly the right
    rows, and files outside the pruned set keep their ORIGINAL adds."""
    tbl = _banded_table(spark, tmp_path)
    before = {f["path"] for f in dl._snapshot_state(spark, tbl)["files"]}
    dl.delta_delete(spark, tbl, "k >= 10 AND k < 15")
    state = dl._snapshot_state(spark, tbl)
    after = {f["path"] for f in state["files"]}
    got = sorted(r["k"] for r in dl.delta_snapshot(spark, tbl).collect())
    assert got == list(range(10)) + list(range(15, 30))
    # The two out-of-band files were never rewritten.
    assert len(before & after) == 2
    # Unsupported predicate shape still deletes correctly (full-scan path).
    dl.delta_delete(spark, tbl, "k % 2 = 1")
    got = sorted(r["k"] for r in dl.delta_snapshot(spark, tbl).collect())
    assert got == [k for k in list(range(10)) + list(range(15, 30)) if k % 2 == 0]


def test_delete_all_files_pruned_commits_noop(spark, tmp_path):
    tbl = _banded_table(spark, tmp_path)
    before = {f["path"] for f in dl._snapshot_state(spark, tbl)["files"]}
    v = dl.delta_delete(spark, tbl, "k >= 1000")
    assert v == 3
    assert {f["path"] for f in dl._snapshot_state(spark, tbl)["files"]} == before


def test_merge_discovery_is_key_bound_pruned_and_exact(spark, tmp_path):
    """MERGE bounds its hit-discovery by the source's key [min, max]:
    a source whose keys live in one band rewrites ONLY that band's file;
    an empty source inserts nothing and rewrites nothing."""
    tbl = _banded_table(spark, tmp_path)
    before = {f["path"] for f in dl._snapshot_state(spark, tbl)["files"]}
    src = spark.createDataFrame([(12,), (14,), (31,)], "k long")
    dl.delta_merge(spark, tbl, src, on=["k"])
    state = dl._snapshot_state(spark, tbl)
    after = {f["path"] for f in state["files"]}
    assert len(before & after) == 2  # bands 1 and 3 untouched
    got = sorted(r["k"] for r in dl.delta_snapshot(spark, tbl).collect())
    assert got == sorted(set(range(30)) | {31})
    # Empty source: no candidates, no rewrite, insert set empty.
    before = {f["path"] for f in dl._snapshot_state(spark, tbl)["files"]}
    dl.delta_merge(spark, tbl, spark.createDataFrame([], "k long"), on=["k"])
    assert {f["path"] for f in dl._snapshot_state(spark, tbl)["files"]} == before


def test_delta_scan_pushes_predicate_into_parquet(spark, tmp_path):
    """The surviving files' scan still gets the predicate as a parquet
    PushedFilter — skipping prunes WHOLE files, pushdown prunes row
    groups/pages inside the survivors; both halves must be present."""
    tbl = _banded_table(spark, tmp_path)
    df = ds.delta_scan(spark, tbl, "k >= 10 AND k < 20")
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = plan.split("PushedFilters")[1][:200]
    assert "GreaterThanOrEqual(k,10" in pushed and "LessThan(k,20" in pushed


def test_nan_double_never_pruned_and_log_stays_valid_json(spark, tmp_path):
    """ADVICE r15 #1 (NaN soundness): a file holding a NaN row must never
    be skipped — Spark treats NaN as GREATER than every value, so it
    matches >, >=, != any finite literal. The writer drops the poisoned
    column's bounds (footer max=NaN), the commit log stays spec-valid
    JSON (no NaN token), and every predicate's pruned result equals the
    plain filter."""
    tbl = str(tmp_path / "t")
    dl.delta_write(
        spark,
        spark.createDataFrame(
            [(1, 5.0), (2, float("nan")), (3, 7.5)], "k long, x double"
        ).repartition(1),
        tbl,
    )
    dl.delta_write(
        spark,
        spark.createDataFrame([(4, 100.0), (5, 200.0)], "k long, x double")
        .repartition(1),
        tbl,
        mode="append",
    )
    files = dl._snapshot_state(spark, tbl)["files"]
    for f in files:
        # Strict JSON parse: a NaN token in stats would raise here.
        stats = json.loads(f["stats"], parse_constant=lambda s: (_ for _ in ()).throw(ValueError(s)))
        assert stats["tightBounds"] is True
    by_min_k = {json.loads(f["stats"])["minValues"]["k"]: json.loads(f["stats"]) for f in files}
    assert "x" not in by_min_k[1]["minValues"]  # NaN-poisoned column dropped
    assert "x" in by_min_k[4]["minValues"]      # clean file keeps bounds
    snap = dl.delta_snapshot(spark, tbl)
    for pred in ("x > 10", "x >= 10", "x != 5", "x = 5", "x < 10", "x <= 7.5"):
        want = sorted(r["k"] for r in snap.filter(pred).collect())
        got = sorted(r["k"] for r in ds.delta_scan(spark, tbl, pred).collect())
        assert got == want, pred
    # The NaN row itself survives a pruned upper-bound scan (the exact
    # silent-drop ADVICE flagged): k=2 matches x > 10 under Spark NaN order.
    got = sorted(r["k"] for r in ds.delta_scan(spark, tbl, "x > 10").collect())
    assert 2 in got


def test_nan_delete_removes_the_nan_row(spark, tmp_path):
    """delta_delete prunes its hit scan via prune_files — with the NaN
    guard the NaN row is found and deleted by an upper-bound predicate."""
    tbl = str(tmp_path / "t")
    dl.delta_write(
        spark,
        spark.createDataFrame(
            [(1, 5.0), (2, float("nan")), (3, 700.0)], "k long, x double"
        ).repartition(1),
        tbl,
    )
    dl.delta_delete(spark, tbl, "x > 600")
    got = sorted(r["k"] for r in dl.delta_snapshot(spark, tbl).collect())
    assert got == [1]  # both the finite 700 and the NaN row are gone


def test_foreign_float_stats_without_tightbounds_keep_on_upper_bound():
    """A FOREIGN add with finite float bounds but no tightBounds marker
    could hide a NaN row (comparison-based max folds leave max finite) —
    upper-bound skips must keep the file; lower-bound skips stay sound."""
    mk = lambda stats: {"partitionValues": {}, "stats": json.dumps(stats)}
    foreign = mk({"minValues": {"x": 1.0}, "maxValues": {"x": 5.0}})
    ours = mk({"minValues": {"x": 1.0}, "maxValues": {"x": 5.0},
               "tightBounds": True})
    assert ds._atom_can_match("x", ">", 10, foreign) is True     # keep
    assert ds._atom_can_match("x", ">=", 10, foreign) is True    # keep
    assert ds._atom_can_match("x", ">", 10, ours) is False       # skip
    assert ds._atom_can_match("x", "<", 0, foreign) is False     # lower bound: skip ok
    assert ds._atom_can_match("x", "=", 10, foreign) is False    # NaN != finite lit
    # All-constant != skip needs tight bounds too.
    const_foreign = mk({"minValues": {"x": 5.0}, "maxValues": {"x": 5.0}})
    const_ours = mk({"minValues": {"x": 5.0}, "maxValues": {"x": 5.0},
                     "tightBounds": True})
    assert ds._atom_can_match("x", "!=", 5, const_foreign) is True
    assert ds._atom_can_match("x", "!=", 5, const_ours) is False
    # Integer bounds carry no NaN risk — skipping works without the marker.
    int_foreign = mk({"minValues": {"k": 1}, "maxValues": {"k": 5}})
    assert ds._atom_can_match("k", ">", 10, int_foreign) is False


def test_nan_stats_bounds_keep_file():
    """Foreign stats carrying a literal NaN bound (json.loads accepts the
    token) admit no interval reasoning — file kept for every op."""
    add = {"partitionValues": {},
           "stats": '{"minValues": {"x": 1.0}, "maxValues": {"x": NaN}}'}
    for op in ("<", "<=", ">", ">=", "=", "!="):
        assert ds._atom_can_match("x", op, 10, add) is True


def test_nan_partition_value_follows_spark_order():
    """A NaN partition value matches >, >=, != any finite literal under
    Spark's NaN-is-greatest order (Python semantics would say False)."""
    add = {"partitionValues": {"p": "NaN"}, "stats": None}
    assert ds._atom_can_match("p", ">", 10, add) is True
    assert ds._atom_can_match("p", ">=", 10, add) is True
    assert ds._atom_can_match("p", "!=", 10, add) is True
    assert ds._atom_can_match("p", "<", 10, add) is False
    assert ds._atom_can_match("p", "<=", 10, add) is False
    assert ds._atom_can_match("p", "=", 10, add) is False
