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
