"""Data skipping over the delta layer's per-file column stats.

`sources/deltalog.py` writes spec-shaped ``stats`` JSON (numRecords +
minValues / maxValues / nullCount from the parquet footer) on every add
action. This module is the READ half: prune the snapshot's file list
with a predicate BEFORE planning the scan, the way delta-spark's
data-skipping reader turns min/max metadata into skipped I/O. At 100 TB
this is the difference between "scan the table" and "scan the band the
predicate names": the file list is driver-side metadata (the same
metadata any FileIndex holds), so pruning costs a metadata walk and
saves data-proportional I/O. When the live file list outgrows the
driver, the spec's answer is evaluating the same bounds as a Spark job
over the checkpoint's stats column — an extension of this layer, not a
redesign.

Soundness contract: `delta_scan` NEVER changes results — the predicate
is also applied as a normal filter on the surviving files, so pruning is
purely an I/O optimization. The bounds evaluator only skips a file when
the predicate is provably false everywhere in it:

- conjunction/disjunction distribute over per-file "can this file
  contain a matching row?" (AND may prune more; OR prunes only when
  every branch does);
- atoms `col op literal` check the file's [min, max] interval —
  numeric AND string (string maxima may be writer-widened truncation
  successors, which every upper-bound skip tolerates; float upper-bound
  skips additionally require the writer's tightBounds NaN-absence
  certificate, see `_atom_can_match`);
- `col IS [NOT] NULL` atoms check the file's nullCount/numRecords
  (all-null files skip IS NOT NULL, no-null files skip IS NULL);
- a partition column compares EXACTLY against the file's
  partitionValues (partition pruning through the same path);
- anything unknown — missing stats, unparseable predicate shape,
  type-mismatched literals — conservatively keeps the file.

The reference repo (/root/reference) has no storage layer; this family
is north-star capability per SURVEY.md §2B.
"""

from __future__ import annotations

import json
import math
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opencode_hive_archon_spark.session import read_table
from opencode_hive_archon_spark.spec import QuerySpec
from opencode_hive_archon_spark.sources.deltalog import (
    _cents,
    _demo_table,
    _generated_columns,
    _mapping_enabled,
    _physical_map,
    _read_state,
    _snapshot_state,
    delta_write,
)

# ---------------------------------------------------------------------------
# restricted predicate parser
# ---------------------------------------------------------------------------
#
# Grammar (a deliberate subset — anything outside it falls back to
# "scan everything", never to a wrong answer):
#   expr   := term ('OR' term)*
#   term   := factor ('AND' factor)*
#   factor := '(' expr ')' | atom
#   atom   := ident op literal | literal op ident
#           | ident 'IS' 'NULL' | ident 'IS' 'NOT' 'NULL'
#   op     := '<=' '>=' '<' '>' '=' '==' '!=' '<>'
#   literal:= integer | float | 'single-quoted string' ('' escapes ')
_TOKEN_RE = re.compile(
    r"\s*(?:(?P<lpar>\()|(?P<rpar>\))|(?P<op><=|>=|==|!=|<>|<|>|=)"
    r"|(?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<word>[A-Za-z_][A-Za-z0-9_]*))"
)
_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "=", "!=": "!="}


def _tokenize(text: str) -> list[tuple[str, object]] | None:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            return None if text[pos:].strip() else out
        pos = m.end()
        if m.lastgroup == "num":
            text_num = m.group("num")
            # Keep integral literals as Python ints: float() is lossy
            # above 2^53, and a rounded bound could wrongly SKIP a file
            # containing a matching int64 (Python compares int vs int —
            # and int vs float — exactly, so mixed comparisons downstream
            # stay sound).
            val = (
                float(text_num)
                if ("." in text_num or "e" in text_num or "E" in text_num)
                else int(text_num)
            )
            out.append(("num", val))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "word":
            word = m.group("word")
            upper = word.upper()
            if upper in ("AND", "OR", "IS", "NOT", "NULL"):
                out.append((upper, upper))
            elif upper in ("IN", "LIKE", "BETWEEN"):
                return None  # outside the supported subset
            else:
                out.append(("ident", word))
        elif m.lastgroup == "op":
            op = m.group("op")
            out.append(("op", {"==": "=", "<>": "!="}.get(op, op)))
        else:
            out.append((m.lastgroup, m.group()))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, object]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, object] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, kind: str) -> object | None:
        t = self.peek()
        if t and t[0] == kind:
            self.i += 1
            return t[1]
        return None

    def expr(self):
        node = self.term()
        branches = [node]
        while node is not None and self.take("OR"):
            node = self.term()
            branches.append(node)
        if any(b is None for b in branches):
            return None
        return branches[0] if len(branches) == 1 else ("or", branches)

    def term(self):
        node = self.factor()
        branches = [node]
        while node is not None and self.take("AND"):
            node = self.factor()
            branches.append(node)
        if any(b is None for b in branches):
            return None
        return branches[0] if len(branches) == 1 else ("and", branches)

    def factor(self):
        if self.take("lpar") is not None:
            node = self.expr()
            if node is None or self.take("rpar") is None:
                return None
            return node
        return self.atom()

    def _literal(self):
        lit = self.take("num")
        if lit is None:
            lit = self.take("str")
        return lit

    def atom(self):
        col = self.take("ident")
        if col is not None:
            if self.take("IS") is not None:
                neg = self.take("NOT") is not None
                if self.take("NULL") is None:
                    return None
                # ("null", col, neg): neg=False -> IS NULL,
                #                     neg=True  -> IS NOT NULL
                return ("null", col, neg)
            op = self.take("op")
            if op is None:
                return None
            lit = self._literal()
            if lit is None:
                return None
            return ("atom", col, op, lit)
        lit = self._literal()
        if lit is not None:
            op = self.take("op")
            if op is None:
                return None
            col = self.take("ident")
            if col is None:
                return None
            return ("atom", col, _FLIP[op], lit)
        return None


def parse_skipping_predicate(text: str):
    """AST for the supported subset, or None (→ no skipping)."""
    tokens = _tokenize(text)
    if not tokens:
        return None
    p = _Parser(tokens)
    node = p.expr()
    if node is None or p.i != len(p.toks):
        return None
    return node


# ---------------------------------------------------------------------------
# per-file bounds evaluation
# ---------------------------------------------------------------------------

_HIVE_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


def _string_typed_cols(meta: dict | None) -> frozenset[str] | None:
    """Names (logical AND physical, so the set works both before and
    after `_rename_atoms`) of top-level STRING-typed columns, from the
    metaData schemaString. None when the schema is UNAVAILABLE — the
    caller must then treat every column's type as unknown and keep the
    file (a genuinely string-typed column falling into the numeric
    fallback could disagree with Spark's lexicographic compare and
    wrongly prune a matching file; ADVICE r17 #2)."""
    if not meta or not meta.get("schemaString"):
        return None
    out: set[str] = set()
    try:
        fields = json.loads(meta["schemaString"]).get("fields", [])
    except (ValueError, TypeError):
        return None
    for field in fields:
        if field.get("type") == "string":
            out.add(field["name"])
            md = field.get("metadata") or {}
            phys = md.get("delta.columnMapping.physicalName")
            if phys:
                out.add(phys)
    return frozenset(out)


def _date_typed_cols(meta: dict | None) -> frozenset[str]:
    """Top-level DATE-typed columns (logical and physical names). A
    DATE partition value is the hive dir's `YYYY-MM-DD` string, whose
    code-point order IS date order — so an ISO-shaped string literal
    can be compared lexicographically, exactly like a string column.
    Empty (never None) when the schema is unavailable: an unknown
    column simply isn't in the set and the caller keeps the file."""
    if not meta or not meta.get("schemaString"):
        return frozenset()
    out: set[str] = set()
    try:
        fields = json.loads(meta["schemaString"]).get("fields", [])
    except (ValueError, TypeError):
        return frozenset()
    for field in fields:
        if field.get("type") == "date":
            out.add(field["name"])
            md = field.get("metadata") or {}
            phys = md.get("delta.columnMapping.physicalName")
            if phys:
                out.add(phys)
    return frozenset(out)


_ISO_DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}")
# A timestamp/date literal whose leading 10 chars are the ISO day.
_TS_LIT_RE = re.compile(r"(\d{4}-\d{2}-\d{2})([ T].*)?")
# The generation-expression shape pruning understands: CAST(src AS DATE)
# (delta-spark's canonical derived-partition pattern). Anything else
# keeps files — sound, just not accelerated.
_CAST_DATE_RE = re.compile(
    r"\s*CAST\s*\(\s*`?([A-Za-z_][A-Za-z0-9_]*)`?\s+AS\s+DATE\s*\)\s*",
    re.IGNORECASE,
)


def _augment_generated(node, meta: dict | None):
    """Derive partition-pruning atoms THROUGH generation expressions
    (the delta-spark generated-column optimization): for a partition
    column g generated as `CAST(src AS DATE)`, every predicate atom on
    `src` with a timestamp-shaped string literal implies a day-level
    atom on g — `src >= L` ⇒ `g >= date(L)`, `src <(=) U` ⇒
    `g <= date(U)`, `src = x` ⇒ `g = date(x)` (CAST AS DATE is
    monotone non-decreasing, so each implication holds row-wise).
    The derived atom is AND-ed onto the source atom, which is sound
    under any and/or structure: it only ever REMOVES candidate files
    for rows the original atom already excludes.

    This is the ONLY pruning path for timestamp predicates: the stats
    writer deliberately drops non-numeric logical values, so `src`
    itself carries no footer bounds."""
    gens: dict[str, str] = {}
    for name, expr in _generated_columns(meta).items():
        m = _CAST_DATE_RE.fullmatch(expr)
        if m:
            gens[m.group(1).lower()] = name

    if not gens:
        return node

    def walk(n):
        kind = n[0]
        if kind in ("and", "or"):
            return (kind, [walk(b) for b in n[1]])
        if kind == "null":
            return n
        _, col, op, lit = n
        g = gens.get(col.lower())
        if g is None or not isinstance(lit, str):
            return n
        m = _TS_LIT_RE.fullmatch(lit)
        if m is None:
            return n
        day = m.group(1)
        rest = m.group(2)
        midnight = rest is None or re.fullmatch(
            r"[ T]00:00:00(\.0+)?", rest
        )
        if op in (">", ">="):
            derived = ("atom", g, ">=", day)
        elif op == "<" and midnight:
            # ts < midnight(U) excludes ALL of day U: tighten to <.
            derived = ("atom", g, "<", day)
        elif op in ("<", "<="):
            derived = ("atom", g, "<=", day)
        elif op == "=":
            derived = ("atom", g, "=", day)
        else:  # '!=' admits no day-level implication
            return n
        return ("and", [n, derived])

    return walk(node)


def _atom_can_match(
    col: str, op: str, lit, add: dict,
    string_cols: frozenset | None = frozenset(),
    date_cols: frozenset = frozenset(),
) -> bool:
    """Could `col op lit` be true for ANY row of this file? Partition
    values are exact (every row shares them); data columns use the
    footer [min, max]; anything unresolvable keeps the file.

    `string_cols` names the columns the table schema declares as STRING:
    a string literal compared against a partition column is evaluated
    lexicographically ONLY when the column is string-typed. For any
    other type Spark CASTS before comparing (``p < '10'`` with partition
    value ``'9'`` on an int column is 9 < 10 = true, but '9' < '10' is
    lexicographically false), so a raw string compare would skip files
    that contain matching rows — those columns fall through to the
    numeric parse of the partition value, or keep the file. A `None`
    string_cols means the schema is UNKNOWN — then neither compare is
    provably Spark's, so a string-literal partition atom keeps the
    file (ADVICE r17 #2)."""
    pv = add.get("partitionValues") or {}
    if col in pv:
        raw = pv[col]
        if raw is None or raw == _HIVE_NULL_PART:
            # NULL partition value: NULL op anything is NULL, which a
            # filter treats as false — no row of this file can match a
            # comparison atom.
            return False
        if isinstance(lit, str):
            if string_cols is None:
                # Schema unknown: the column may be string-typed (then
                # Spark compares lexicographically) or not (then it
                # casts) — neither fallback is provably right, so keep
                # the file (sound).
                return True
            if col in date_cols:
                # DATE partition column: the hive value is the ISO
                # `YYYY-MM-DD` string, whose code-point order IS date
                # order — compare lexicographically, but ONLY when both
                # sides are ISO-shaped (Spark would CAST a loose form
                # like '2024-1-8' to the same date; lexicographic order
                # on it would diverge, so keep the file instead).
                if _ISO_DATE_RE.fullmatch(lit) and _ISO_DATE_RE.fullmatch(
                    raw
                ):
                    return {
                        "<": raw < lit, "<=": raw <= lit, ">": raw > lit,
                        ">=": raw >= lit, "=": raw == lit,
                        "!=": raw != lit,
                    }[op]
                return True
            if col not in string_cols:
                # String literal vs a schema-confirmed NON-string
                # partition column: Spark compares post-cast, not
                # lexicographically. If the literal parses as a number,
                # compare numerically (mirrors Spark's string↔numeric
                # coercion); otherwise conservatively keep the file.
                try:
                    lit = int(lit)
                except (TypeError, ValueError):
                    try:
                        lit = float(lit)
                    except (TypeError, ValueError):
                        return True
                if isinstance(lit, float) and math.isnan(lit):
                    # A NaN literal compares under Spark's NaN-greatest
                    # order, not Python's all-False — keep the file
                    # rather than model that rarity here.
                    return True
            else:
                # Partition values are stored as strings; compare
                # directly (code-point order == Spark's binary
                # collation).
                return {
                    "<": raw < lit, "<=": raw <= lit, ">": raw > lit,
                    ">=": raw >= lit, "=": raw == lit, "!=": raw != lit,
                }[op]
        try:
            # int first (exact at any magnitude), float only for
            # decimal-shaped values.
            val = int(raw)
        except (TypeError, ValueError):
            try:
                val = float(raw)
            except (TypeError, ValueError):
                return True
        if isinstance(val, float) and math.isnan(val):
            # float("NaN") parses; Spark orders NaN GREATER than every
            # value, so a NaN partition matches >, >= and != any finite
            # literal and never matches <, <=, =. Python's NaN
            # comparisons (all False, != True) would get >/>= wrong.
            return op in (">", ">=", "!=")
        return {
            "<": val < lit, "<=": val <= lit, ">": val > lit,
            ">=": val >= lit, "=": val == lit, "!=": val != lit,
        }[op]
    stats = json.loads(add["stats"]) if add.get("stats") else {}
    mins = stats.get("minValues") or {}
    maxs = stats.get("maxValues") or {}
    if col not in mins or col not in maxs:
        return True
    lo, hi = mins[col], maxs[col]
    if isinstance(lit, str):
        if not isinstance(lo, str) or not isinstance(hi, str):
            return True
        # String interval logic. The writer may have WIDENED hi (prefix-
        # successor of a truncated max) — every skip below relies on hi
        # only as an upper bound, which widening preserves. `!=` is the
        # exception: the all-constant skip needs lo == hi == the EXACT
        # value, which truncation can fake (lo a prefix of the true min,
        # hi a widened successor can collide) — keep the file.
        if op == "<":
            return lo < lit
        if op == "<=":
            return lo <= lit
        if op == ">":
            return hi > lit
        if op == ">=":
            return hi >= lit
        if op == "=":
            return lo <= lit <= hi
        return True  # '!='
    if not isinstance(lo, (int, float)) or not isinstance(hi, (int, float)):
        return True
    if (isinstance(lo, float) and math.isnan(lo)) or (
        isinstance(hi, float) and math.isnan(hi)
    ):
        # Foreign stats may carry NaN bounds (json.loads accepts the
        # NaN token; Spark's own parquet footers fold NaN into max).
        # NaN admits no interval reasoning — keep the file.
        return True
    if (isinstance(lo, float) or isinstance(hi, float)) and not stats.get(
        "tightBounds", False
    ):
        # Float column without this layer's tightBounds invariant (our
        # writer drops non-finite bounds, so its finite bounds certify
        # NaN absence; a FOREIGN writer's finite max certifies nothing —
        # e.g. a comparison-based fold leaves max finite with NaN rows
        # present). Under Spark's NaN-is-greatest semantics a hidden NaN
        # row matches `>`/`>=`/`!=` any finite literal, so every skip
        # that relies on the UPPER bound (or on all-constancy) must keep
        # the file. Lower-bound skips stay sound: NaN never matches
        # `<`/`<=`, and `=` with a finite literal never matches NaN.
        if op in (">", ">=", "!="):
            return True
    if op == "<":
        return lo < lit
    if op == "<=":
        return lo <= lit
    if op == ">":
        return hi > lit
    if op == ">=":
        return hi >= lit
    if op == "=":
        return lo <= lit <= hi
    # '!=': only an all-constant file equal to the literal is skippable.
    return not (lo == hi == lit)


def _null_can_match(col: str, neg: bool, add: dict) -> bool:
    """Could `col IS [NOT] NULL` hold for ANY row of this file? Uses the
    nullCount/numRecords the writer already emits: a no-null file is
    skippable for IS NULL, an all-null file for IS NOT NULL; unknown
    counts keep the file."""
    pv = add.get("partitionValues") or {}
    if col in pv:
        is_null = pv[col] is None or pv[col] == _HIVE_NULL_PART
        return is_null != neg
    stats = json.loads(add["stats"]) if add.get("stats") else {}
    nc = (stats.get("nullCount") or {}).get(col)
    if not isinstance(nc, int) or isinstance(nc, bool):
        return True
    if neg:  # IS NOT NULL: any non-null row?
        n = stats.get("numRecords")
        if not isinstance(n, int) or isinstance(n, bool):
            return True
        return nc < n
    return nc > 0  # IS NULL: any null row?


def _can_match(
    node, add: dict, string_cols: frozenset | None = frozenset(),
    date_cols: frozenset = frozenset(),
) -> bool:
    kind = node[0]
    if kind == "and":
        return all(
            _can_match(b, add, string_cols, date_cols) for b in node[1]
        )
    if kind == "or":
        return any(
            _can_match(b, add, string_cols, date_cols) for b in node[1]
        )
    if kind == "null":
        _, col, neg = node
        return _null_can_match(col, neg, add)
    _, col, op, lit = node
    return _atom_can_match(col, op, lit, add, string_cols, date_cols)


def _rename_atoms(node, mapping: dict[str, str]):
    kind = node[0]
    if kind in ("and", "or"):
        return (kind, [_rename_atoms(b, mapping) for b in node[1]])
    if kind == "null":
        _, col, neg = node
        return ("null", mapping.get(col, col), neg)
    _, col, op, lit = node
    return ("atom", mapping.get(col, col), op, lit)


def prune_files(state: dict, predicate: str) -> list[dict]:
    """The subset of state['files'] that could contain a matching row.
    Unsupported predicate shapes return the full list. Under column
    mapping the predicate's LOGICAL names are translated to the physical
    names the footer stats are keyed by."""
    node = parse_skipping_predicate(predicate)
    if node is None:
        return list(state["files"])
    # Derive generated-column atoms BEFORE the physical rename (the
    # stored generation expression references LOGICAL names).
    node = _augment_generated(node, state.get("meta"))
    if _mapping_enabled(state.get("meta")):
        node = _rename_atoms(node, _physical_map(state["meta"]))
    string_cols = _string_typed_cols(state.get("meta"))
    date_cols = _date_typed_cols(state.get("meta"))
    return [
        f
        for f in state["files"]
        if _can_match(node, f, string_cols, date_cols)
    ]


def prune_files_by_key_bounds(
    files: list[dict], bounds: dict[str, tuple]
) -> list[dict]:
    """Files that could contain a row whose key columns all fall inside
    `bounds` ({col: (lo, hi)}) — the MERGE-side pruning: a target file is
    skippable when ANY key column's [min, max] is disjoint from the
    source's [lo, hi] (per-column overlap is necessary for a match, so
    skipping on any disjoint column is sound). Missing / non-numeric
    stats keep the file."""
    out: list[dict] = []
    for f in files:
        stats = json.loads(f["stats"]) if f.get("stats") else {}
        mins = stats.get("minValues") or {}
        maxs = stats.get("maxValues") or {}
        tight = bool(stats.get("tightBounds", False))
        keep = True
        for col, (lo, hi) in bounds.items():
            fmin, fmax = mins.get(col), maxs.get(col)
            if not isinstance(fmin, (int, float)) or not isinstance(
                fmax, (int, float)
            ):
                continue
            if (isinstance(fmin, float) or isinstance(fmax, float)) and (
                not tight
                or (isinstance(lo, float) and math.isnan(lo))
                or (isinstance(hi, float) and math.isnan(hi))
            ):
                # Float key without our writer's tightBounds certificate
                # (or a NaN source bound): a hidden NaN key row could
                # match a NaN source key despite disjoint finite bounds —
                # missing it would turn an UPDATE into a duplicate
                # INSERT. Keep the file. (NaN FILE bounds need no extra
                # branch: NaN comparisons below are False → keep.)
                continue
            if fmax < lo or fmin > hi:
                keep = False
                break
        if keep:
            out.append(f)
    return out


def delta_scan(
    spark: SparkSession,
    table: str,
    predicate: str,
    version: int | None = None,
) -> DataFrame:
    """`delta_snapshot(...).filter(predicate)` with stats-based file
    skipping: plans the scan over ONLY the files whose [min, max] /
    partitionValues admit the predicate, then applies the predicate as a
    normal filter — identical results, less I/O."""
    state = _snapshot_state(spark, table, version)
    pruned = dict(state, files=prune_files(state, predicate))
    return _read_state(spark, table, pruned).filter(F.expr(predicate))


def delta_scan_accounting(
    spark: SparkSession,
    table: str,
    predicate: str,
    version: int | None = None,
) -> tuple[int, int]:
    """(n_files_total, n_files_scanned) for a predicate — the skipping
    arithmetic, driver-side metadata only."""
    state = _snapshot_state(spark, table, version)
    return len(state["files"]), len(prune_files(state, predicate))


# ---------------------------------------------------------------------------
# driver query
# ---------------------------------------------------------------------------

# Price bands; each becomes one single-file commit so every file's
# min/max interval is a known band. All four bands are populated at
# every shipped sf (TPC-H o_totalprice spans ~900..560k).
_BANDS = [(0.0, 100_000.0), (100_000.0, 200_000.0),
          (200_000.0, 300_000.0), (300_000.0, 10_000_000.0)]
_SKIP_LO, _SKIP_HI = 100_000.0, 200_000.0  # predicate picks band 2 only


def source_delta_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File skipping on footer stats: four single-file commits, one per
    o_totalprice band, then a banded predicate scan that provably plans
    ONE of the four files (n_files_total / n_files_scanned are protocol
    arithmetic the oracle pins as constants) and whose content columns
    (count, key checksum, exact-cents sum) hash-check the surviving rows
    against the orders table.

    Scale shape: pruning walks the driver-side file list (the metadata a
    FileIndex already holds) and the scan reads one band's bytes — I/O
    tracks the predicate's selectivity, not table size. The oracle pins
    the same aggregate computed directly, so a pruning bug that skipped
    a matching file would hash-mismatch, not just slow down."""
    table = _demo_table(sf_dir, "skip", "orders.parquet")
    marker = os.path.join(table, "_BUILD_OK")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(table, ignore_errors=True)
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        for lo, hi in _BANDS:
            band = orders.filter(
                (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)
            ).repartition(1)
            delta_write(spark, band, table, mode="append")
        with open(marker, "w") as fh:
            fh.write("ok")
    predicate = (
        f"o_totalprice >= {_SKIP_LO} AND o_totalprice < {_SKIP_HI}"
    )
    n_total, n_scanned = delta_scan_accounting(spark, table, predicate)
    return delta_scan(spark, table, predicate).agg(
        F.lit(n_total).alias("n_files_total"),
        F.lit(n_scanned).alias("n_files_scanned"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        _cents("o_totalprice").alias("price_cents"),
    )


_ORACLE_SKIP = f"""
SELECT {len(_BANDS)} AS n_files_total,
       1 AS n_files_scanned,
       count(*) AS n_rows,
       CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM orders
WHERE o_totalprice >= {_SKIP_LO} AND o_totalprice < {_SKIP_HI}
"""


# ---------------------------------------------------------------------------
# driver query: null-aware skipping (VERDICT r15 top-next)
# ---------------------------------------------------------------------------
#
# Three single-file commits over the orders table, split by priority so
# the per-file null profile is KNOWN: an all-null file (nullCount ==
# numRecords), a no-null file (nullCount == 0), and a mixed file. The
# IS NOT NULL scan provably plans 2 of 3 files (all-null skipped), the
# IS NULL scan the other 2 of 3 (no-null skipped) — arithmetic pinned as
# constants, surviving rows hash-checked against a relational
# reconstruction. The skipped I/O comes from the nullCount field the
# writer has emitted since r14; r16 taught the pruning reader to use it.
_NULL_ALL, _NULL_NONE, _NULL_MIXED = "1-URGENT", "2-HIGH", "3-MEDIUM"


def source_delta_null_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL file skipping on nullCount stats: the all-null file
    never plans for IS NOT NULL, the no-null file never plans for IS
    NULL, the mixed file always does. Scale shape: pruning is a driver-
    side metadata walk; each scan reads only the files whose null
    profile admits the predicate — at 100 TB an IS NOT NULL over a
    sparsely-populated column skips the dense-null majority of files."""
    table = _demo_table(sf_dir, "nullskip", "orders.parquet")
    marker = os.path.join(table, "_BUILD_OK")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(table, ignore_errors=True)
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        )
        for prio, maybe in (
            (_NULL_ALL, F.lit(None).cast("double")),
            (_NULL_NONE, F.col("o_totalprice")),
            (_NULL_MIXED, F.when(
                F.col("o_orderkey") % 2 == 1, F.col("o_totalprice")
            )),
        ):
            band = (
                orders.filter(F.col("o_orderpriority") == prio)
                .select("o_orderkey", maybe.alias("maybe_price"))
                .repartition(1)
            )
            delta_write(spark, band, table, mode="append")
        with open(marker, "w") as fh:
            fh.write("ok")
    n_total, nn_scanned = delta_scan_accounting(
        spark, table, "maybe_price IS NOT NULL"
    )
    _, n_scanned = delta_scan_accounting(spark, table, "maybe_price IS NULL")
    notnull = delta_scan(spark, table, "maybe_price IS NOT NULL").agg(
        F.count(F.lit(1)).alias("notnull_rows"),
        F.sum("o_orderkey").alias("notnull_key_sum"),
        _cents("maybe_price").alias("notnull_price_cents"),
    )
    isnull = delta_scan(spark, table, "maybe_price IS NULL").agg(
        F.count(F.lit(1)).alias("null_rows"),
        F.sum("o_orderkey").alias("null_key_sum"),
    )
    return notnull.crossJoin(isnull).select(
        F.lit(n_total).alias("n_files_total"),
        F.lit(nn_scanned).alias("n_files_notnull_scan"),
        F.lit(n_scanned).alias("n_files_null_scan"),
        "notnull_rows", "notnull_key_sum", "notnull_price_cents",
        "null_rows", "null_key_sum",
    )


_ORACLE_NULLSKIP = f"""
WITH t AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '{_NULL_NONE}' THEN o_totalprice
              WHEN o_orderpriority = '{_NULL_MIXED}' AND o_orderkey % 2 = 1
                THEN o_totalprice
         END AS maybe_price
  FROM orders
  WHERE o_orderpriority IN
        ('{_NULL_ALL}', '{_NULL_NONE}', '{_NULL_MIXED}')
)
SELECT 3 AS n_files_total,
       2 AS n_files_notnull_scan,
       2 AS n_files_null_scan,
       count(maybe_price) AS notnull_rows,
       CAST(sum(CASE WHEN maybe_price IS NOT NULL THEN o_orderkey END)
            AS BIGINT) AS notnull_key_sum,
       CAST(sum(CAST(round(maybe_price * 100) AS BIGINT)) AS BIGINT)
         AS notnull_price_cents,
       count(*) - count(maybe_price) AS null_rows,
       CAST(sum(CASE WHEN maybe_price IS NULL THEN o_orderkey END)
            AS BIGINT) AS null_key_sum
FROM t
"""


# ---------------------------------------------------------------------------
# driver query: string skipping with truncated bounds
# ---------------------------------------------------------------------------
#
# Three single-file commits banded by o_orderpriority (a short string
# whose bounds index exactly) plus a DERIVED 70-char tag column whose
# bounds exercise the truncate-plus-successor rule. Both an equality and
# a range predicate plan exactly 1 of 3 files; the truncated-tag range
# predicate also plans 1 of 3 — all three accountings pinned, all
# surviving rows hash-checked.
_STR_BANDS = (("1-URGENT", "2-HIGH"), ("3-MEDIUM",),
              ("4-NOT SPECIFIED", "5-LOW"))


def source_delta_string_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-column file skipping: short strings bound exactly; long
    strings (the 70-char tag) get truncated minima and prefix-successor
    maxima, which every upper-bound skip tolerates. Scale shape:
    identical to numeric skipping — driver-side metadata walk, I/O
    tracks predicate selectivity."""
    table = _demo_table(sf_dir, "strskip", "orders.parquet")
    marker = os.path.join(table, "_BUILD_OK")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(table, ignore_errors=True)
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice", "o_orderpriority",
            F.concat(
                F.col("o_orderpriority"), F.lit("-"),
                F.lit("x" * 60),
            ).alias("tag"),
        )
        for prios in _STR_BANDS:
            band = orders.filter(
                F.col("o_orderpriority").isin(*prios)
            ).repartition(1)
            delta_write(spark, band, table, mode="append")
        with open(marker, "w") as fh:
            fh.write("ok")
    n_total, eq_scanned = delta_scan_accounting(
        spark, table, "o_orderpriority = '3-MEDIUM'"
    )
    _, ge_scanned = delta_scan_accounting(
        spark, table, "o_orderpriority >= '4'"
    )
    _, tag_scanned = delta_scan_accounting(spark, table, "tag < '2'")
    eq = delta_scan(spark, table, "o_orderpriority = '3-MEDIUM'").agg(
        F.count(F.lit(1)).alias("eq_rows"),
        F.sum("o_orderkey").alias("eq_key_sum"),
        _cents("o_totalprice").alias("eq_price_cents"),
    )
    ge = delta_scan(spark, table, "o_orderpriority >= '4'").agg(
        F.count(F.lit(1)).alias("ge_rows"),
        F.sum("o_orderkey").alias("ge_key_sum"),
    )
    tag = delta_scan(spark, table, "tag < '2'").agg(
        F.count(F.lit(1)).alias("tag_rows"),
        F.sum("o_orderkey").alias("tag_key_sum"),
    )
    return eq.crossJoin(ge).crossJoin(tag).select(
        F.lit(n_total).alias("n_files_total"),
        F.lit(eq_scanned).alias("n_files_eq_scan"),
        F.lit(ge_scanned).alias("n_files_ge_scan"),
        F.lit(tag_scanned).alias("n_files_tag_scan"),
        "eq_rows", "eq_key_sum", "eq_price_cents",
        "ge_rows", "ge_key_sum", "tag_rows", "tag_key_sum",
    )


_ORACLE_STRSKIP = """
SELECT 3 AS n_files_total,
       1 AS n_files_eq_scan,
       1 AS n_files_ge_scan,
       1 AS n_files_tag_scan,
       count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS eq_rows,
       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_orderkey END)
            AS BIGINT) AS eq_key_sum,
       CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                     THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
            AS BIGINT) AS eq_price_cents,
       count(CASE WHEN o_orderpriority >= '4' THEN 1 END) AS ge_rows,
       CAST(sum(CASE WHEN o_orderpriority >= '4' THEN o_orderkey END)
            AS BIGINT) AS ge_key_sum,
       count(CASE WHEN o_orderpriority < '2' THEN 1 END) AS tag_rows,
       CAST(sum(CASE WHEN o_orderpriority < '2' THEN o_orderkey END)
            AS BIGINT) AS tag_key_sum
FROM orders
"""


SPECS = [
    QuerySpec(
        "source_delta_stats_skipping", source_delta_stats_skipping,
        _ORACLE_SKIP, "sources",
        "Delta data skipping: per-file min/max footer stats prune a "
        "banded predicate scan to 1 of 4 files; skipping arithmetic "
        "pinned as constants, surviving rows hash-checked",
    ),
    QuerySpec(
        "source_delta_null_skipping", source_delta_null_skipping,
        _ORACLE_NULLSKIP, "sources",
        "Null-aware delta data skipping: nullCount stats skip the "
        "all-null file for IS NOT NULL and the no-null file for IS "
        "NULL; pruning arithmetic pinned, survivors hash-checked",
    ),
    QuerySpec(
        "source_delta_string_skipping", source_delta_string_skipping,
        _ORACLE_STRSKIP, "sources",
        "String delta data skipping: exact short-string bounds plus "
        "truncate-and-successor-widened long-string maxima prune "
        "equality and range scans to 1 of 3 files each",
    ),
]
