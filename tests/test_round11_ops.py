"""Invariant tests for the round-11 operators: the tokenizer train->apply
handoff, the kmeans-trained IVF composition, and semantic dedup — pinning
the SEMANTIC composition properties the per-operator oracle comparison
cannot express (does apply really consume train's table? do the IVF cells
really come from the exact trainer?)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from opencode_hive_archon_spark.operators import similarity as S
from opencode_hive_archon_spark.operators import textops as T
from opencode_hive_archon_spark.session import read_table

_SEP = "\x1f"


def _norm(text: str) -> str:
    # Mirror of the engine's normalization ORDER: lower -> trim (spaces)
    # -> whitespace collapse -> separator reservation.
    t = re.sub(r"\s+", " ", text.lower().strip(" "))
    return t.replace(_SEP, "")


def test_tokenize_trained_reproduces_train_merges(spark, sf_dir):
    """The handoff gate (VERDICT r10 #1): replaying corpus_bpe_train's
    merge table generation-by-generation over the corpus (independent
    driver-side Python, not Spark) must reproduce each generation's
    n_merges EXACTLY, and the final segmentation must match
    corpus_tokenize_trained's emitted id streams symbol-for-symbol."""
    train = sorted(
        T.corpus_bpe_train(spark, sf_dir).collect(),
        key=lambda r: r["generation"],
    )
    assert len(train) == T.BPE_TRAIN_GENERATIONS
    docs = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    state = {
        d: "".join(f"{_SEP}{c}{_SEP}" for c in _norm(t)) for d, t in docs.items()
    }
    for row in train:
        pat = f"{_SEP}{row['left_sym']}{_SEP}{_SEP}{row['right_sym']}{_SEP}"
        rep = f"{_SEP}{row['left_sym']}{row['right_sym']}{_SEP}"
        # str.count / str.replace are leftmost non-overlapping — the same
        # semantics as Spark's and DuckDB's replace(), so the count of
        # occurrences IS the number of merges the engine applied.
        n = sum(s.count(pat) for s in state.values())
        assert n == row["n_merges"], (row["generation"], n, row["n_merges"])
        state = {d: s.replace(pat, rep) for d, s in state.items()}

    mtab: dict[str, int] = {}
    for row in train:  # ascending generation => setdefault keeps the min
        mtab.setdefault(row["left_sym"] + row["right_sym"], row["generation"])
    applied = {
        r["doc_id"]: r for r in T.corpus_tokenize_trained(spark, sf_dir).collect()
    }
    assert set(applied) == set(state)
    n_merged_total = 0
    for d, s in state.items():
        syms = [x.replace(_SEP, "") for x in s.split(_SEP + _SEP)]
        syms = [x for x in syms if x]
        ids = [
            str(mtab[x]) if len(x) > 1 else str(1000 + ord(x)) for x in syms
        ]
        r = applied[d]
        assert r["n_symbols"] == len(syms), d
        assert r["n_merged"] == sum(1 for x in syms if len(x) > 1), d
        assert r["ids_csv"] == "-".join(ids), d
        n_merged_total += r["n_merged"]
    assert n_merged_total > 0  # the corpus genuinely exercises the merges


def test_tokenize_trained_symbol_conservation(spark, sf_dir):
    """Per-document accounting: n_symbols + (merge length overhead) must
    equal the normalized char count — every char lands in exactly one
    symbol. Uses only engine outputs (no Python replay)."""
    rows = T.corpus_tokenize_trained(spark, sf_dir).collect()
    train = T.corpus_bpe_train(spark, sf_dir).collect()
    sym_len = {  # generation id -> merged symbol length
        r["generation"]: len(r["left_sym"] + r["right_sym"]) for r in train
    }
    docs = {
        r["doc_id"]: len(_norm(r["text"]))
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        ids = [int(x) for x in r["ids_csv"].split("-")] if r["ids_csv"] else []
        chars = sum(sym_len[i] if i < 1000 else 1 for i in ids)
        assert chars == docs[r["doc_id"]], r["doc_id"]
        assert len(ids) == r["n_symbols"]


def test_ivf_kmeans_cells_match_trainer_assignment(spark, sf_dir):
    """The composition gate (VERDICT r10 #3): every neighbor
    ann_ivf_kmeans_topk returns must sit in the SAME cell the exact
    trainer's assignment puts it in, the probed cells must be the NPROBE
    nearest trained centroids to the query, and recall vs the brute-force
    baseline must clear the IVF floor."""
    vecs, cents = S._kmeans_train(spark, sf_dir)
    assigned = {
        r["vec_id"]: r["cid"] for r in S._kmeans_assign(vecs, cents).collect()
    }
    rows = S.ann_ivf_kmeans_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cid"] == assigned[r["vec_id"]], r

    # probed cells == NPROBE nearest centroids to the query vector
    qq = next(
        r["q"] for r in vecs.filter(F.col("vec_id") == S.QUERY_VEC_ID).collect()
    )
    cds = []
    for c in cents.collect():
        d = sum((a - b) * (a - b) for a, b in zip(c["c"], qq))
        cds.append((d, c["cid"]))
    want_cells = {cid for _, cid in sorted(cds)[: S.IVF_NPROBE]}
    assert {r["cid"] for r in rows} <= want_cells

    # recall floor vs exact brute force (same floor as the float-IVF gate)
    exact = {r["vec_id"] for r in S.similarity_topk(spark, sf_dir).collect()}
    got = {r["vec_id"] for r in rows}
    assert len(got & exact) / len(exact) >= 0.6, sorted(got & exact)


def test_semantic_prune_verdict_sound_and_grounded(spark, sf_dir):
    """SemDeDup verdict invariants: (a) drops are SOUND — every dropped
    vector has a genuine lower-id same-cell neighbor with brute-force
    quantized cosine >= threshold (recomputed all-pairs in numpy, no LSH);
    (b) the lowest-id vector of every cell is kept; (c) the flag columns
    are mutually consistent; (d) the corpus genuinely exercises drops."""
    import numpy as np

    rows = S.dedup_semantic_prune(spark, sf_dir).collect()
    assert len(rows) > 0
    drops = [r for r in rows if not r["keep"]]
    assert drops, "corpus produced no semantic dups — test is vacuous"
    for r in rows:
        if r["keep"]:
            assert r["n_dup_neighbors"] == 0 and r["max_dup_sim"] is None, r
        else:
            assert r["n_dup_neighbors"] >= 1, r
            assert r["max_dup_sim"] >= S.NEAR_DUP_COSINE, r

    cell = {r["vec_id"]: r["cid"] for r in rows}
    by_cell: dict[int, list[int]] = {}
    for v, c in cell.items():
        by_cell.setdefault(c, []).append(v)
    kept = {r["vec_id"] for r in rows if r["keep"]}
    for c, members in by_cell.items():
        assert min(members) in kept, c  # nothing below it can drop it

    emb = {
        r["vec_id"]: np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * S.QUANT_SCALE
        ).astype(np.int64)
        for r in read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }

    def qcos(a, b):
        d = float(np.dot(a, b))
        n = float(np.sqrt(np.dot(a, a))) * float(np.sqrt(np.dot(b, b)))
        return d / n if n != 0.0 else None

    for r in drops:
        vb = r["vec_id"]
        found = any(
            va < vb
            and cell[va] == cell[vb]
            and (s := qcos(emb[va], emb[vb])) is not None
            and s >= S.NEAR_DUP_COSINE
            for va in by_cell[cell[vb]]
        )
        assert found, vb


def test_semantic_prune_chain_drops_transitively(spark):
    """VERDICT r13 #3: pin the implemented pruning rule — the public
    SemDeDup reference implementation's upper-triangular max (drop i when
    ANY earlier in-cluster duplicate exists, surviving or not), NOT the
    sequential keep-set greedy. Construct a synthetic chain A~B, B~C with
    A≁C (unit vectors at 0°/40°/80° in a plane; cos40°≈0.766 ≥ 0.3
    threshold, cos80°≈0.174 < it) inside one deterministic corpus:
    vectors 1..40 are zero in the chain plane, so they are the LSH
    hyperplanes (chain sigs all-zero → guaranteed candidate collisions)
    and the kmeans seeds (zero dot with the chain → A,B,C share a cell by
    the tie-break). The triangular rule drops BOTH B and C; the greedy
    would re-admit C once B is gone."""
    import math
    import os
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    D = 64
    rows = []
    for vid in range(1, 41):
        v = np.zeros(D)
        v[2:] = rng.randn(D - 2)
        v /= np.linalg.norm(v)
        rows.append((vid, v))
    for vid, ang in [(41, 0.0), (42, 40.0), (43, 80.0)]:
        v = np.zeros(D)
        v[0] = math.cos(math.radians(ang))
        v[1] = math.sin(math.radians(ang))
        rows.append((vid, v))
    assert math.cos(math.radians(40)) >= S.NEAR_DUP_COSINE   # A~B, B~C
    assert math.cos(math.radians(80)) < S.NEAR_DUP_COSINE    # A≁C

    tmp = tempfile.mkdtemp(prefix="semchain_")
    try:
        pq.write_table(
            pa.table({
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r[1].tolist() for r in rows], pa.list_(pa.float32())
                ),
                "label": pa.array([r[0] % 5 for r in rows], pa.int32()),
            }),
            os.path.join(tmp, "embeddings.parquet"),
        )
        out = {
            r["vec_id"]: r
            for r in S.dedup_semantic_prune(spark, tmp).collect()
        }
        A, B, C = out[41], out[42], out[43]
        assert A["cid"] == B["cid"] == C["cid"], "chain split across cells"
        assert A["keep"] and A["n_dup_neighbors"] == 0
        assert not B["keep"] and B["n_dup_neighbors"] == 1
        # C is dropped through B ALONE (n_dup_neighbors=1, max sim =
        # cos40° to B, not cos80° to A) even though B itself was dropped —
        # the chain-drop the docstring declares.
        assert not C["keep"] and C["n_dup_neighbors"] == 1
        assert abs(C["max_dup_sim"] - math.cos(math.radians(40))) < 1e-5
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
