"""Text-analysis expression semantics (north-star operators)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from employee_data_management_system_data_engineering_solution_spark.functions import text as tx


def _one(spark, text, col):
    df = spark.createDataFrame([Row(t=text)])
    return df.select(col(F.col("t")).alias("v")).collect()[0].v


def test_word_count(spark):
    assert _one(spark, "one two  three", tx.word_count) == 3
    assert _one(spark, "", tx.word_count) == 0
    assert _one(spark, "   ", tx.word_count) == 0


def test_token_count_words_numbers_punct(spark):
    # "ab, 12!" → [ab][,][12][!]
    assert _one(spark, "ab, 12!", tx.token_count) == 4


def test_punct_ratio(spark):
    assert _one(spark, "ab!!", tx.punct_ratio) == 0.5
    assert _one(spark, "abcd", tx.punct_ratio) == 0.0


def test_normalized(spark):
    assert _one(spark, "  Hello   WORLD ", tx.normalized) == "hello world"


def test_fingerprint_is_word_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", tx.fingerprint)
    b = _one(spark, "gamma   alpha beta beta", tx.fingerprint)
    c = _one(spark, "alpha beta delta", tx.fingerprint)
    assert a == b and a != c


def test_stopword_hits(spark):
    assert _one(spark, "the cat and the hat", tx.stopword_hits) == 3
    assert _one(spark, "cat hat", tx.stopword_hits) == 0


def test_quality_score_range(spark):
    v = _one(spark, "the quick brown fox jumps over the lazy dog " * 20, tx.quality_score)
    assert 0.0 <= v <= 1.0


def test_minhash_signature_identical_texts_match(spark):
    df = spark.createDataFrame(
        [Row(id=1, t="alpha beta gamma"), Row(id=2, t="beta  gamma   ALPHA"), Row(id=3, t="")]
    )
    sig = df.select("id", *tx.minhash_signature(F.col("t"), 4)).collect()
    by_id = {r.id: tuple(r)[1:] for r in sig}
    assert by_id[1] == by_id[2]  # same word set ⇒ same signature
    assert by_id[3] == ("z" * 32,) * 4  # empty doc sentinel


def test_scrub_pii_all_kinds(spark):
    msg = "mail a.b+c@test.org or call 555-123-4567 from 192.168.1.1 today"
    got = _one(spark, msg, tx.scrub_pii)
    assert got == "mail <EMAIL> or call <PHONE> from <IP> today"


def test_scrub_pii_counts(spark):
    df = spark.createDataFrame(
        [Row(t="x@y.io and z@w.net"), Row(t="no pii here"), Row(t="10.0.0.1 9.9.9.9")]
    )
    rows = df.select(*tx.pii_counts(F.col("t"))).collect()
    assert [tuple(r) for r in rows] == [(2, 0, 0), (0, 0, 0), (0, 0, 2)]


def test_scrub_pii_leaves_clean_text(spark):
    msg = "version 1.2 costs 12.50 at 3pm"  # dotted numbers that are NOT IPs
    assert _one(spark, msg, tx.scrub_pii) == msg


def test_lm_doc_score_matches_hand_model(spark):
    """lm_doc_score: per-doc mean ln((C(a,b)+1)/(C(a)+|V|)) with
    corpus-wide add-one-smoothed bigram counts, checked against an
    independent scalar recomputation."""
    import math

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import (
        REGISTRY,
    )

    texts = {1: "a b a b c", 2: "a b", 3: "z q z"}
    # independent model
    from collections import Counter

    uni, bi = Counter(), Counter()
    doc_bigrams = {}
    for d, t in texts.items():
        w = t.split()
        uni.update(w)
        pairs = list(zip(w, w[1:]))
        bi.update(pairs)
        doc_bigrams[d] = pairs
    vocab = len(uni)
    want = {
        d: round(
            sum(math.log((bi[p] + 1) / (uni[p[0]] + vocab)) for p in pairs) / len(pairs),
            4,
        )
        for d, pairs in doc_bigrams.items()
    }

    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="lm_docs_")
    try:
        df = spark.createDataFrame(
            [(d, t) for d, t in texts.items()], "doc_id long, text string"
        )
        df.coalesce(1).write.parquet(f"{tmp}/stage")
        part = glob.glob(f"{tmp}/stage/part-*.parquet")[0]
        shutil.move(part, f"{tmp}/documents.parquet")
        got = {
            r.doc_id: (r.n_bigrams, r.lm_score)
            for r in REGISTRY["lm_doc_score"].fn(spark, tmp).collect()
        }
        assert got == {
            1: (4, want[1]),
            2: (1, want[2]),
            3: (2, want[3]),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_bm25_matches_pure_python_reference(spark):
    """BM25 top-5 for every query equals an independent pure-Python
    computation over the same corpus (Lucene idf, k1=1.2, b=0.75,
    4-dp rounding), and the scoring pipeline stays JVM-side."""
    import contextlib
    import io
    import math
    from collections import Counter

    import pandas as pd

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    df = REGISTRY["bm25_topk"].fn(spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    assert "Python" not in buf.getvalue()
    got = {
        (r.query_id, r.rank): (r.doc_id, r.bm25) for r in df.collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    toks = {
        int(r.doc_id): r.text.strip().lower().split()
        for r in docs.itertuples()
        if r.text.strip()
    }
    N = len(toks)
    S = sum(len(t) for t in toks.values())
    dfreq = Counter()
    for t in toks.values():
        dfreq.update(set(t))
    expected = {}
    for qid in sorted(toks):
        if qid % 100:
            continue
        qterms = set(docs.set_index("doc_id").loc[qid, "text"].strip().lower()[:40].strip().split())
        scored = []
        for d, t in toks.items():
            tf = Counter(t)
            s = 0.0
            for term in qterms:
                if term not in tf:
                    continue
                idf = math.log(1 + (N - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
                s += idf * ((22 * S * tf[term]) / (10 * S * tf[term] + 3 * S + 9 * len(t) * N))
            if s:
                scored.append((round(s, 4), d))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rk, (sc, d) in enumerate(scored[:5], 1):
            expected[(qid, rk)] = (d, sc)
    assert got == expected


def test_hybrid_rrf_fuses_runs_exactly(spark):
    """The fused output must equal a pure-Python RRF over the two
    upstream runs re-ranked at k=20 (lexical BM25, semantic cosine)."""
    from pyspark.sql import functions as F

    from employee_data_management_system_data_engineering_solution_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from employee_data_management_system_data_engineering_solution_spark.plans.llm import _bm25_ranked
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY
    from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    lex = {
        (r.query_id, r.doc_id): r.rank
        for r in _bm25_ranked(spark, sf).filter(F.col("rank") <= 20).collect()
    }
    emb = read_table(spark, sf, "embeddings")
    sem = {
        (r.query_id, r.neighbor_id): r.rank
        for r in cosine_topk_bruteforce(
            emb.filter(F.col("vec_id") % 100 == 0), emb, k=20
        ).collect()
    }
    want = {}
    for q, d in set(lex) | set(sem):
        s = 0.0
        if (q, d) in lex:
            s += 1.0 / (60 + lex[(q, d)])
        if (q, d) in sem:
            s += 1.0 / (60 + sem[(q, d)])
        want[(q, d)] = round(s, 6)
    got = REGISTRY["hybrid_rrf_topk"].fn(spark, sf).collect()
    assert got and all(r.rank <= 10 for r in got)
    for r in got:
        assert r.rrf_score == want[(r.query_id, r.doc_id)]
        assert r.rank_lex == lex.get((r.query_id, r.doc_id))
        assert r.rank_sem == sem.get((r.query_id, r.doc_id))
    # per query, the kept rows are exactly the 10 best by (score, doc)
    for q in {r.query_id for r in got}:
        kept = sorted(
            ((r.rrf_score, r.doc_id) for r in got if r.query_id == q),
            key=lambda t: (-t[0], t[1]),
        )
        best = sorted(
            ((s, d) for (qq, d), s in want.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[: len(kept)]
        assert kept == best


def test_ndcg_mrr_matches_python_replay(spark):
    """nDCG@5 / MRR replayed in pure Python over the (already
    oracle-checked) bm25_topk run and the (source, lang) graded truth
    at sf0.001 — same pinned ln literals, same left-assoc chains."""
    import math

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY
    from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    top = REGISTRY["bm25_topk"].fn(spark, sf).collect()
    docs = (
        read_table(spark, sf, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "source", "lang")
        .collect()
    )
    meta = {r.doc_id: (r.source, r.lang) for r in docs}
    from collections import Counter, defaultdict

    nsl = Counter(meta.values())
    runs = defaultdict(dict)
    for r in top:
        runs[r.query_id][r.rank] = r.doc_id
    got = {r.query_id: r for r in REGISTRY["ndcg_mrr_report"].fn(spark, sf).collect()}
    ln = [math.log(k) for k in (2, 3, 4, 5, 6)]
    assert set(got) == set(runs)
    for q, byrank in runs.items():
        qkey = meta[q]
        gains, first = [0] * 5, 0
        for rank in sorted(byrank):
            d = byrank[rank]
            rel = 3 if d == q else (1 if meta[d] == qkey else 0)
            gains[rank - 1] = 7 if rel == 3 else (1 if rel == 1 else 0)
            if rel > 0 and first == 0:
                first = rank
        dcg = (
            gains[0] / ln[0] + gains[1] / ln[1] + gains[2] / ln[2]
            + gains[3] / ln[3] + gains[4] / ln[4]
        )
        n_same = nsl[qkey] - 1
        idcg = 7.0 / ln[0]
        for j in range(1, min(4, n_same) + 1):
            idcg += 1.0 / ln[j]
        r = got[q]
        assert r.n_rel == 1 + n_same
        assert r.first_rel == first
        assert r.rr == (0.0 if first == 0 else round(1.0 / first, 6))
        # report columns are rounded 6 dp; compare within that grid
        assert abs(r.dcg5 - dcg) < 5.1e-7
        assert abs(r.idcg5 - idcg) < 5.1e-7
        assert abs(r.ndcg5 - dcg / idcg) < 5.1e-7
        assert 0.0 <= r.ndcg5 <= 1.0


def test_unicode_script_profile_mixed_scripts(spark, tmp_path):
    """Script counts on a hand-built mixed-script frame: Latin covers
    accented letters, Han/Cyrillic/Arabic are counted by script, the
    explicit ASCII classes catch digits/whitespace/punct, and the
    remainder lands in other_chars."""
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rows = [
        (0, "Hello, World! 42"),
        (1, "Привет мир 你好 abc"),
        (2, ""),
        (3, "café naïve"),  # accented Latin IS Latin script
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in REGISTRY["unicode_script_profile"].fn(spark, str(tmp_path)).collect()
    }
    r0 = got[0]
    assert (r0.n_chars, r0.latin_chars, r0.digit_chars) == (16, 10, 2)
    assert (r0.ws_chars, r0.punct_chars, r0.other_chars) == (2, 2, 0)
    assert r0.latin_share == round(10 / 16, 6)
    r1 = got[1]
    assert (r1.cyrillic_chars, r1.han_chars, r1.latin_chars) == (9, 2, 3)
    assert r1.non_latin_script_share == round(11 / 17, 6)
    r2 = got[2]
    assert r2.n_chars == 0 and r2.latin_share is None
    r3 = got[3]
    assert r3.latin_chars == 9 and r3.other_chars == 0  # é/ï are Latin


def test_gopher_repetition_report_hand_built(spark, tmp_path):
    """Repetition signals on a constructed looped doc vs a clean doc:
    the loop has high word-rep, a dominant bigram, and duplicate
    5-grams; the clean doc reports zeros/NULLs per the length rules."""
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    loop = "buy now " * 10  # 20 words: 'buy now' x10
    rows = [(0, loop.strip()), (1, "one two three four"), (2, "solo"),
            (3, "a a a")]  # self-overlapping top bigram: raw 2*2/3 > 1
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in REGISTRY["gopher_repetition_report"].fn(spark, str(tmp_path)).collect()
    }
    r0 = got[0]
    assert r0.n_words == 20
    assert r0.word_rep_ratio == round(1 - 2 / 20, 6)
    # 'buy now' occurs 10 of 19 bigram positions -> 2*10/20 = 1.0
    assert r0.top_bigram_share == 1.0
    # all 16 5-gram positions belong to grams occurring >= 2 times
    assert r0.dup_5gram_share == 1.0
    r1 = got[1]
    assert r1.word_rep_ratio == 0.0
    assert r1.top_bigram_share == round(2 / 4, 6)  # every bigram unique, top=1
    assert r1.dup_5gram_share is None  # only 4 words
    r2 = got[2]
    assert r2.top_bigram_share is None and r2.dup_5gram_share is None
    # the share honors its [0, 1] contract even when the top bigram
    # self-overlaps ('a a' twice over 3 words -> raw 4/3, clamped)
    assert got[3].top_bigram_share == 1.0


def test_benchmark_decontamination_planted_overlap(spark, tmp_path):
    """A planted verbatim 8-gram shared between an eval doc (id 20)
    and a train doc is reported; a disjoint eval doc reports zero; a
    too-short eval doc reports n_grams = 0 with NULL share."""
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    rows = [
        (20, shared + " iota kappa"),          # eval: 10 words -> 3 grams, 1 contaminated
        (40, "uno dos tres cuatro cinco seis siete ocho nueve"),  # eval, disjoint
        (60, "too short"),                      # eval, no 8-gram
        (1, "prefix words " + shared),          # train holds the planted gram
        (2, "filler train doc with none of those words at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in REGISTRY["benchmark_decontamination"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {20, 40, 60}
    assert got[20].n_grams == 3 and got[20].n_contaminated == 1
    assert got[20].contamination_share == round(1 / 3, 6)
    assert got[40].n_contaminated == 0 and got[40].contamination_share == 0.0
    assert got[60].n_grams == 0 and got[60].contamination_share is None


def test_cross_split_leakage_planted_neardup(spark, tmp_path):
    """A train doc that is a light edit of an eval doc (doc_id 20)
    must surface as a leak with high Jaccard; an unrelated eval doc
    reports zero leaks with NULL jaccard/partner."""
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    evtext = (
        "the quick brown fox jumps over the lazy dog while the rain "
        "falls gently on the quiet harbor town at dusk tonight"
    )
    rows = [
        (20, evtext),                          # eval
        (3, evtext + " extra"),                # train near-dup of 20
        (40, "completely different words nowhere near the others xyzzy plugh"),
        (7, "another unrelated training document about shipping manifests"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    # fresh memo per tmp corpus: the pair memo is keyed by (app, dir)
    got = {
        r.eval_doc_id: r
        for r in REGISTRY["cross_split_leakage"].fn(spark, str(tmp_path)).collect()
    }
    assert set(got) == {20, 40}
    assert got[20].n_leaky_train_docs >= 1
    assert got[20].worst_train_doc == 3
    assert got[20].max_jaccard >= 0.5
    assert got[40].n_leaky_train_docs == 0
    assert got[40].max_jaccard is None and got[40].worst_train_doc is None


def test_token_mixture_plan_matches_python(spark, tmp_path):
    """Shares, τ=0.5 shares, and boosts equal a pure-Python replay on
    a skewed two-source corpus; the tail source gets boost > 1, the
    head < 1, and τ=0.5 shares still sum to ~1."""
    import math

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rows = [(i, "w " * 99 + "w", "big") for i in range(9)] + [
        (100, "only ten words here to make a tiny tail source", "small")
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.source: r
        for r in REGISTRY["token_mixture_plan"].fn(spark, str(tmp_path)).collect()
    }
    toks = {"big": 9 * 100, "small": 10}
    t = sum(toks.values())
    sq = {s: round(math.sqrt(v), 6) for s, v in toks.items()}
    tsq = sum(sq.values())
    for s in toks:
        r = got[s]
        assert r.n_tokens == toks[s]
        assert r.natural_share == round(toks[s] / t, 6)
        assert abs(r.t05_share - sq[s] / tsq) < 2e-6
        assert abs(r.boost - (sq[s] / tsq) / (toks[s] / t)) < 1e-4
    assert got["small"].boost > 1 > got["big"].boost
    assert abs(got["big"].t05_share + got["small"].t05_share - 1.0) < 1e-5


def test_embedding_dim_profile_matches_numpy(spark):
    """Per-dimension mean/std/min/max equal a numpy replay over the
    6-dp-rounded components at sf0.001; no dimension is constant on
    the synthetic corpus."""
    import numpy as np

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY
    from employee_data_management_system_data_engineering_solution_spark.sources.io import read_table

    sf = "/root/testdata/sf0.001"
    got = {r.dim: r for r in REGISTRY["embedding_dim_profile"].fn(spark, sf).collect()}
    mat = np.array(
        [r.embedding for r in read_table(spark, sf, "embeddings").collect()],
        dtype=float,
    )
    mat = np.round(mat, 6)
    assert len(got) == mat.shape[1]
    for d in range(mat.shape[1]):
        col = mat[:, d]
        r = got[d]
        assert r.n == len(col)
        assert abs(r.mean_v - col.mean()) < 2e-6
        assert abs(r.std_v - col.std()) < 2e-6  # population std
        assert r.min_v == col.min() and r.max_v == col.max()
        assert not r.is_constant


def test_token_mixture_plan_zero_token_source(spark, tmp_path):
    """A source whose docs are all empty text reports 0 tokens,
    natural_share 0.0, and NULL boost (0/0 is undefined, and the
    division must not trip ANSI mode)."""
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rows = [
        (0, "five words of real text", "live"),
        (1, "   ", "ghost"),
        (2, "", "ghost"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.source: r
        for r in REGISTRY["token_mixture_plan"].fn(spark, str(tmp_path)).collect()
    }
    assert got["ghost"].n_tokens == 0
    assert got["ghost"].natural_share == 0.0
    assert got["ghost"].t05_share == 0.0
    assert got["ghost"].boost is None
    assert got["live"].boost == 1.0  # only token-bearing source


def test_embedding_dim_profile_constant_dimension(spark, tmp_path):
    """A constant dimension reports std 0.0 and is_constant=True —
    the greatest(.,0) guard keeps the variance chain inside sqrt's
    domain when the exact decimal sums make it an ulp negative."""
    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rows = [(i, [0.5, float(i) / 10.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    got = {r.dim: r for r in REGISTRY["embedding_dim_profile"].fn(spark, str(tmp_path)).collect()}
    assert got[0].is_constant and got[0].std_v == 0.0 and got[0].mean_v == 0.5
    assert not got[1].is_constant and got[1].std_v > 0


def test_gopher_repetition_matches_python_on_random_corpora(spark, tmp_path):
    """Deterministic randomized replay: repetition signals equal a
    pure-Python reference on seeded random word-soup corpora (small
    alphabet forces heavy natural repetition and gram ties)."""
    import random
    from collections import Counter

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rng = random.Random(7)
    vocab = ["a", "b", "c", "dd", "ee"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in REGISTRY["gopher_repetition_report"].fn(spark, str(tmp_path)).collect()
    }
    for doc_id, text in rows:
        w = text.strip().lower().split()
        r = got[doc_id]
        assert r.n_words == len(w)
        assert r.word_rep_ratio == round(1 - len(set(w)) / len(w), 6)
        if len(w) >= 2:
            bg = Counter(zip(w, w[1:]))
            assert r.top_bigram_share == min(
                round(2 * max(bg.values()) / len(w), 6), 1.0
            )
        else:
            assert r.top_bigram_share is None
        if len(w) >= 5:
            g5 = Counter(tuple(w[i : i + 5]) for i in range(len(w) - 4))
            dup = sum(c for c in g5.values() if c >= 2)
            assert r.dup_5gram_share == round(dup / (len(w) - 4), 6)
        else:
            assert r.dup_5gram_share is None


def test_benchmark_decontamination_matches_python_on_random_corpora(spark, tmp_path):
    """Deterministic randomized replay: per-eval-doc contaminated-gram
    counts equal a pure-Python distinct-8-gram set intersection on a
    seeded corpus built to contain partial cross-split copies."""
    import random

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rng = random.Random(11)
    vocab = [f"w{k}" for k in range(12)]
    texts = {}
    for i in range(30):
        texts[i] = [rng.choice(vocab) for _ in range(rng.randint(0, 25))]
    # splice spans of eval docs into some train docs (real contamination)
    for ev in (0, 20):
        if len(texts[ev]) >= 10:
            texts[3] = texts[3] + texts[ev][:10]
    rows = [(i, " ".join(ws)) for i, ws in texts.items()]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in REGISTRY["benchmark_decontamination"].fn(spark, str(tmp_path)).collect()
    }
    def grams(ws):
        return {tuple(ws[i : i + 8]) for i in range(len(ws) - 7)} if len(ws) >= 8 else set()
    train = set()
    for i, ws in texts.items():
        if i % 20 != 0:
            train |= grams(ws)
    for i, ws in texts.items():
        if i % 20 != 0:
            continue
        g = grams(ws)
        r = got[i]
        assert r.n_grams == len(g), i
        assert r.n_contaminated == len(g & train), i
        if g:
            assert r.contamination_share == round(len(g & train) / len(g), 6)
        else:
            assert r.contamination_share is None
    # the splice actually contaminated something
    assert any(got[i].n_contaminated > 0 for i in got)


def test_unicode_script_profile_matches_python_on_random_ascii(spark, tmp_path):
    """Deterministic randomized replay over printable ASCII: the
    explicit classes (letters/digits/ws/punct) equal pure-Python
    counts and fully partition the text (other_chars = 0)."""
    import random
    import string

    from employee_data_management_system_data_engineering_solution_spark.plans.registry import REGISTRY

    rng = random.Random(13)
    pool = string.ascii_letters + string.digits + string.punctuation + " \t\n\r"
    rows = [
        (i, "".join(rng.choice(pool) for _ in range(rng.randint(0, 60))))
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: r
        for r in REGISTRY["unicode_script_profile"].fn(spark, str(tmp_path)).collect()
    }
    for i, t in rows:
        r = got[i]
        assert r.n_chars == len(t)
        assert r.latin_chars == sum(c in string.ascii_letters for c in t)
        assert r.digit_chars == sum(c in string.digits for c in t)
        assert r.ws_chars == sum(c in " \t\n\r" for c in t)
        assert r.punct_chars == sum(c in string.punctuation for c in t)
        assert r.other_chars == 0
        assert (r.han_chars, r.cyrillic_chars, r.arabic_chars) == (0, 0, 0)
