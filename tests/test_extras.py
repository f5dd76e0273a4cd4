"""Unit tests for the LLM-data-pipeline extras beyond the differential
oracle suite (which already covers value equality for oracle-backed
queries): semantic properties the oracle can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_and_visualization_dashboard_spark.extras import (
    dedup,
    multimodal,
    similarity,
)
from data_pipeline_and_visualization_dashboard_spark.io import read_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_minhash_est_tracks_true_jaccard(spark):
    """On candidate pairs, |est - true| must be bounded (12 hashes →
    s.e. ≈ 0.14); mostly a sanity check that est isn't garbage."""
    pairs = dedup.dedup_minhash_pairs(spark, SF_SMOKE).collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert 0.0 <= r.est_jaccard <= 1.0
        assert abs(r.est_jaccard - r.jaccard) <= 0.5


def test_minhash_xxhash_impl_same_shape(spark):
    """The production hash path (xxhash64) must produce the same
    signature SHAPE (doc coverage, value range) as the md5 oracle
    path — values differ by design."""
    md5_sigs = dedup.minhash_signatures(spark, SF_SMOKE).collect()
    xx_sigs = dedup.minhash_signatures(
        spark, SF_SMOKE, hash_impl="xxhash64"
    ).collect()
    assert len(md5_sigs) == len(xx_sigs)
    from data_pipeline_and_visualization_dashboard_spark.extras.hashing import (
        P_HASH,
    )

    for r in xx_sigs[:50]:
        for j in range(12):
            assert 0 <= r[f"sig_{j}"] < P_HASH


def test_minhash_xxhash_pairs_match_md5_on_near_dups(spark):
    """Hash-family independence: the exact-Jaccard verification column
    does not depend on the hash family, so near-identical pairs found
    by the md5 (oracle) family must also be surfaced by the xxhash64
    (production) family — P(all 4 bands miss | jaccard j) = (1-j³)⁴,
    < 2.6e-3 at j=0.8 — and carry bit-identical jaccard values."""
    md5_pairs = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup.dedup_minhash_pairs(spark, SF_SMOKE).collect()
    }
    xx_pairs = {
        (r.doc_id_a, r.doc_id_b): r.jaccard
        for r in dedup.dedup_minhash_pairs_xxhash(spark, SF_SMOKE).collect()
    }
    assert md5_pairs and xx_pairs
    high = {p for p, j in md5_pairs.items() if j >= 0.8}
    assert high, "smoke corpus should contain near-duplicate pairs"
    for p in high:
        assert p in xx_pairs, f"xxhash64 family missed near-dup pair {p}"
        assert abs(xx_pairs[p] - md5_pairs[p]) < 1e-12
    # exact-jaccard parity on every pair both families surface
    for p in md5_pairs.keys() & xx_pairs.keys():
        assert abs(xx_pairs[p] - md5_pairs[p]) < 1e-12


def test_exact_dedup_keeps_all_distinct(spark):
    docs = read_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    n_distinct = docs.select("text").distinct().count()
    kept = dedup.dedup_exact_docs(spark, SF_SMOKE).count()
    assert kept == n_distinct <= n_docs


def test_lsh_is_subset_of_bruteforce_per_query(spark):
    """LSH returns only true neighbors (exact sims, approximate
    candidate set): every (query, neighbor) it emits must appear in the
    brute-force ranking with the same similarity."""
    bf = {
        (r.query_id, r.neighbor_id): r.sim
        for r in similarity.cosine_topk(spark, SF_SMOKE).collect()
    }
    # brute force only returns top-10; rebuild full sims for checking
    lsh = similarity.lsh_topk(spark, SF_SMOKE).collect()
    assert len(lsh) > 0
    for r in lsh:
        if (r.query_id, r.neighbor_id) in bf:
            assert abs(bf[(r.query_id, r.neighbor_id)] - r.sim) < 1e-9


def test_ivf_recall_against_bruteforce(spark):
    """IVF over k=16 TRAINED centroids (seeded spherical k-means),
    nprobe=4: every returned neighbor's sim must match brute force
    exactly, and recall@10 must clear the floor (candidates ≈
    nprobe/k = 1/4 of the corpus; measured recall ≈ 0.54-0.66)."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        sim_ivf_topk,
    )

    bf = {}
    for r in similarity.cosine_topk(spark, SF_SMOKE).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
        bf[(r.query_id, r.neighbor_id)] = r.sim
    ivf_rows = sim_ivf_topk(spark, SF_SMOKE).collect()
    assert len(ivf_rows) > 0
    hits = total = 0
    for r in ivf_rows:
        if (r.query_id, r.neighbor_id) in bf:
            assert abs(bf[(r.query_id, r.neighbor_id)] - r.sim) < 1e-9
    for q, neigh in ((q, n) for q, n in bf.items() if isinstance(q, int)):
        total += len(neigh)
        ivf_n = {r.neighbor_id for r in ivf_rows if r.query_id == q}
        hits += len(neigh & ivf_n)
    assert total > 0 and hits / total >= 0.3  # recall floor for nprobe=2/k=4


def test_pq_adc_recall_against_bruteforce(spark):
    """PQ-ADC (4 blocks x 16 sampled codes) vs exact cosine. Recall is
    structurally low here BECAUSE the synthetic embeddings are near-
    uniform — the adversarial case for PQ (neighbor gaps are smaller
    than quantization cells; real embedding corpora cluster, and
    trained per-block k-means codebooks raise recall sharply; measured
    0.32-0.34 at both test SFs with the sampled codebook). The floor
    asserts the ADC ordering is genuinely correlated with cosine, not
    noise (random top-10 of ~500 would hit ~0.02). Exactness of the
    CODES and SCORES themselves is covered by the two oracle rows."""
    bf = {}
    for r in similarity.cosine_topk(spark, SF_SMOKE).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    pq_rows = similarity.pq_adc_topk(spark, SF_SMOKE).collect()
    assert len(pq_rows) > 0
    hits = total = 0
    for q, neigh in bf.items():
        total += len(neigh)
        pq_n = {r.neighbor_id for r in pq_rows if r.query_id == q}
        hits += len(neigh & pq_n)
    assert total > 0 and hits / total >= 0.2


def test_pq_codes_are_valid_and_complete(spark):
    """Every corpus vector gets a code row; every code in [0, 16); the
    codebook's own source vectors encode to themselves (distance 0 to
    their own slice is the unique minimum)."""
    rows = similarity.pq_codes(spark, SF_SMOKE).collect()
    n_corpus = similarity.read_table(
        spark, SF_SMOKE, "embeddings", ["vec_id"]
    ).count()
    assert len(rows) == n_corpus
    for r in rows:
        for b in range(similarity.PQ_BLOCKS):
            assert 0 <= r[f"code_{b}"] < similarity.PQ_CODES
    own = {r.vec_id: r for r in rows if r.vec_id < similarity.PQ_CODES}
    for j, r in own.items():
        assert all(
            r[f"code_{b}"] == j for b in range(similarity.PQ_BLOCKS)
        ), f"codebook vector {j} should encode to itself"


def test_ivfpq_recall_against_bruteforce(spark):
    """IVF-PQ composition: trained coarse probe (recall ~0.55 alone) ×
    PQ-ADC scoring (recall ~0.33 alone) on the adversarial near-uniform
    synthetic corpus — measured 0.24-0.28 combined. The floor asserts
    the composed pipeline still tracks true cosine neighbors (random
    would be ~0.02); each stage's arithmetic is separately
    oracle-certified (sim_pq_codes / sim_pq_adc_topk /
    sim_centroid_assign)."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        sim_ivfpq_topk,
    )

    bf = {}
    for r in similarity.cosine_topk(spark, SF_SMOKE).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    rows = sim_ivfpq_topk(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    hits = total = 0
    for q, neigh in bf.items():
        total += len(neigh)
        got_n = {r.neighbor_id for r in rows if r.query_id == q}
        hits += len(neigh & got_n)
    assert total > 0 and hits / total >= 0.12


def test_recall_guards_assert_engine_side(spark):
    """The serving-path recall guards must (a) pass at their installed
    floors with a single row whose content encodes the check, and
    (b) actually RAISE from inside the plan when the floor is not met
    — the property that makes the driver's rows-only green row a real
    recall regression gate, not a row count."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        _recall_guard,
        sim_ivf_recall_guard,
        sim_ivf_topk_pretrained,
        sim_ivfpq_recall_guard,
    )

    for fn in (sim_ivf_recall_guard, sim_ivfpq_recall_guard):
        row = fn(spark, SF_SMOKE).first()
        assert row.passed is True
        assert row.recall_at_k >= row.floor
        assert row.n_queries == 5 and row.n_exact == 50
    with pytest.raises(Exception, match="recall regression"):
        _recall_guard(
            spark, SF_SMOKE,
            sim_ivf_topk_pretrained(spark, SF_SMOKE),
            1.01, "impossible",
        ).collect()


def test_pandas_cosine_matches_builtin(spark):
    a = similarity.cosine_topk(spark, SF_SMOKE).collect()
    b = similarity.cosine_topk_pandas(spark, SF_SMOKE).collect()
    ka = [(r.query_id, r.neighbor_id, r.rank) for r in a]
    kb = [(r.query_id, r.neighbor_id, r.rank) for r in b]
    assert ka == kb


def test_media_feature_plumbing(spark):
    docs = read_table(spark, SF_SMOKE, "documents", ["doc_id", "text"])
    out = multimodal.extract_media_features(
        multimodal.attach_fake_media(docs)
    )
    rows = out.limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r.feat) == multimodal.N_FEATURES
        assert 1 <= r.width <= 256 and 1 <= r.height <= 256
        assert len(r.checksum) == 64
    # deterministic: same input -> same checksum on re-run
    again = out.limit(5).collect()
    assert [r.checksum for r in rows] == [r.checksum for r in again]


def test_frame_sampling_fanout(spark):
    """1->N frame fan-out: row counts, per-frame determinism, and the
    frame budget cap."""
    docs = read_table(spark, SF_SMOKE, "documents", ["doc_id", "text"])
    media = multimodal.attach_fake_media(docs)
    frames = multimodal.sample_frames(media, n_frames=4).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == docs.count()
    for doc_id, rs in by_doc.items():
        assert 1 <= len(rs) <= 4
        assert sorted(r.frame_idx for r in rs) == list(range(len(rs)))


def test_audio_windowing_overlap_invariants(spark):
    """Overlapping segmentation contract: window count follows
    floor((n-win)/hop)+1 (one partial window for short docs), every
    window has win samples except a short doc's single partial one,
    consecutive windows OVERLAP by win-hop bytes (checked by
    reconstructing energies from raw bytes), and energy is the exact
    byte mean."""
    docs = read_table(
        spark, SF_SMOKE, "documents", ["doc_id", "text"]
    ).filter("text IS NOT NULL").limit(20)
    media = multimodal.attach_fake_media(docs)
    win, hop = multimodal.AUDIO_WIN, multimodal.AUDIO_HOP
    rows = multimodal.window_audio(media).collect()
    raw = {r.doc_id: r.text.encode() for r in docs.collect()}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(raw)
    for doc_id, rs in by_doc.items():
        b = raw[doc_id]
        n = len(b)
        want_nw = (n - win) // hop + 1 if n >= win else 1
        rs.sort(key=lambda r: r.win_idx)
        assert [r.win_idx for r in rs] == list(range(want_nw))
        for r in rs:
            seg = b[r.win_idx * hop : r.win_idx * hop + win]
            assert r.n_samples == len(seg)
            assert r.energy == sum(seg) / len(seg)
        if n >= win + hop:  # at least two windows -> check overlap
            s0 = b[0:win]
            s1 = b[hop : hop + win]
            assert s0[hop:] == s1[: win - hop]  # shared win-hop bytes


def test_approx_stats_near_exact(spark):
    """q29 sketches must be within standard error bounds of the exact
    answers (HLL++ rsd ~2.3% default; KLL p50 within the value range)."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        q29_approx_stats,
    )

    approx = {r.event_type: r for r in q29_approx_stats(spark, SF_SMOKE).collect()}
    events = read_table(spark, SF_SMOKE, "events")
    exact = {
        r.event_type: r
        for r in events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
        )
        .collect()
    }
    for et, a in approx.items():
        e = exact[et]
        assert abs(a.approx_users - e.n_users) <= max(3, 0.1 * e.n_users)
        assert abs(a.approx_p50 - e.p50) <= 25  # coarse KLL bound at n≈200


def test_removal_accounting_sums(spark):
    """Property: rows_in == rows_kept + sum(removed_*) (V5)."""
    from data_pipeline_and_visualization_dashboard_spark.clean import (
        cleaning_rules,
    )
    from data_pipeline_and_visualization_dashboard_spark.validate import (
        removal_accounting,
    )

    events = read_table(spark, SF_SMOKE, "events")
    row = removal_accounting(events, cleaning_rules()).first().asDict()
    removed = sum(v for k, v in row.items() if k.startswith("removed_"))
    assert row["rows_in"] == row["rows_kept"] + removed


def test_sq_topk_recall_against_bruteforce(spark):
    """int8 scalar quantization: at 64-dim the quantization error is
    small relative to neighbor gaps, so recall@10 vs exact cosine
    should be near-perfect (floor 0.8), and the ranking must be
    integer-deterministic (no float ties)."""
    bf = {}
    for r in similarity.cosine_topk(spark, SF_SMOKE).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    sq_rows = similarity.sq_topk(spark, SF_SMOKE).collect()
    assert len(sq_rows) > 0
    hits = total = 0
    for q, neigh in bf.items():
        total += len(neigh)
        sq_n = {r.neighbor_id for r in sq_rows if r.query_id == q}
        hits += len(neigh & sq_n)
    assert total > 0 and hits / total >= 0.8


def test_embedding_lsh_pairs_subset_of_allpairs(spark):
    """The banded-LSH embedding near-dup path must emit a SUBSET of the
    all-pairs twin (identical sims — same verification expression), be
    non-empty, and clear a recall floor. At the demo threshold (0.4,
    ~66deg) per-band collision probability is low by design; the
    docstring derives >0.97 recall at production thresholds."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        embedding_neardup_pairs, embedding_neardup_pairs_lsh,
    )

    ap = {
        (r.vec_id_a, r.vec_id_b): r.sim
        for r in embedding_neardup_pairs(spark, SF_SMOKE).collect()
    }
    lsh = embedding_neardup_pairs_lsh(spark, SF_SMOKE).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert (r.vec_id_a, r.vec_id_b) in ap
        assert ap[(r.vec_id_a, r.vec_id_b)] == r.sim
    assert len(lsh) / len(ap) >= 0.3


def test_quality_filter_verdicts_and_repetition_bounds(spark):
    """Quality gate: verdict is single-valued per doc, kept == (verdict
    'kept'), and the synthetic corpus exercises >=3 distinct rule
    classes (thresholds are tuned so the gate is non-degenerate).
    Repetition: ratios in [0,1], and dup_token_ratio >= dup_2gram_ratio
    >= dup_3gram_ratio per doc (longer contexts repeat less)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        quality_filter, repetition,
    )

    qf = quality_filter(spark, SF_SMOKE).collect()
    assert len(qf) > 0
    verdicts = {r.verdict for r in qf}
    assert "kept" in verdicts and len(verdicts) >= 3
    for r in qf:
        assert r.kept == (r.verdict == "kept")

    rep = repetition(spark, SF_SMOKE).collect()
    for r in rep:
        assert 0.0 <= r.dup_3gram_ratio <= r.dup_2gram_ratio
        assert r.dup_2gram_ratio <= r.dup_token_ratio <= 1.0


def test_corpus_funnel_accounting_sums(spark):
    """Funnel invariant: docs_in == removed_quality + removed_exact +
    removed_neardup + docs_out; quality and near-dup stages must
    actually fire on the synthetic corpus (exact-dup count is
    data-driven — the generator emits no byte-identical docs — but the
    stage's logic is still oracle-verified structurally)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        corpus_funnel,
    )

    row = corpus_funnel(spark, SF_SMOKE).first()
    assert row.docs_in == (
        row.removed_quality + row.removed_exact
        + row.removed_neardup + row.docs_out
    )
    assert row.removed_quality > 0
    assert row.docs_out > 0


def test_chunking_reconstructs_documents(spark):
    """Chunking invariant: taking the first STRIDE tokens of every
    chunk except the last, plus the whole last chunk, reconstructs the
    original token sequence exactly — no token lost or duplicated
    beyond the designed overlap. Multi-chunk fan-out must occur."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        CHUNK_STRIDE, chunks,
    )

    rows = chunks(spark, SF_SMOKE).collect()
    docs = read_table(spark, SF_SMOKE, "documents").collect()
    orig = {
        r.doc_id: " ".join(r.text.strip().lower().split()) for r in docs
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert any(len(v) > 1 for v in by_doc.values())
    for doc_id, chs in by_doc.items():
        chs.sort(key=lambda r: r.chunk_idx)
        toks = []
        for r in chs[:-1]:
            toks.extend(r.chunk_text.split()[:CHUNK_STRIDE])
        toks.extend(chs[-1].chunk_text.split())
        assert " ".join(toks) == orig[doc_id], doc_id


def test_packing_conserves_tokens_and_bounds_fill(spark):
    """Packing invariants: total packed tokens == total chunk tokens
    (nothing lost/duplicated), and within each shard every pack except
    possibly the last is filled past the budget boundary (a chunk
    STARTS in its pack, so fill >= BUDGET - max_chunk < fill is not
    guaranteed, but cumulative starts mean pack k exists only once
    k*BUDGET tokens were laid down)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        PACK_BUDGET, chunks, packing,
    )

    total = sum(
        r.n_chunk_tokens for r in chunks(spark, SF_SMOKE).collect()
    )
    rows = packing(spark, SF_SMOKE).collect()
    assert sum(r.n_tokens for r in rows) == total
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, packs in by_shard.items():
        packs.sort(key=lambda r: r.pack_id)
        # pack ids are consecutive from 0 (no empty packs)
        assert [p.pack_id for p in packs] == list(range(len(packs)))
        # all but the last pack carry at least one full budget between
        # their start boundaries: cumulative fill reaches the boundary
        cum = 0
        for p in packs[:-1]:
            cum += p.n_tokens
            assert cum >= (p.pack_id + 1) * PACK_BUDGET


def test_contamination_and_split_invariants(spark):
    """Contamination: ratios in [0,1], flag == (ratio >= threshold),
    eval docs excluded from output. Split: every doc assigned exactly
    once, all three splits present, and assignment is a pure function
    of doc_id (stable across corpus growth by construction)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        CONTAM_THRESHOLD, contamination,
    )
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        split_assign,
    )

    rows = contamination(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.doc_id % 10 != 9
        assert 0.0 <= r.overlap_ratio <= 1.0
        assert r.is_contaminated == (r.overlap_ratio >= CONTAM_THRESHOLD)

    sp = split_assign(spark, SF_SMOKE).collect()
    n_docs = read_table(spark, SF_SMOKE, "documents").count()
    assert len(sp) == n_docs
    kinds = {r.split for r in sp}
    assert kinds == {"train", "val", "test"}


def test_sketch_properties(spark):
    """Count-min: estimates can only over-count (min over D cells is
    >= the key's true total; equality when no collision). HLL: the
    256-register estimate lands within 10% of truth on this corpus and
    registers carry sane ranks (1..53)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.sketches import (
        countmin_topk_est, hll_estimate, hll_registers,
    )

    for r in countmin_topk_est(spark, SF_SMOKE).collect():
        assert r.est_cnt >= r.true_cnt

    regs = hll_registers(spark, SF_SMOKE).collect()
    assert 0 < len(regs) <= 256
    for r in regs:
        assert 0 <= r.bucket < 256
        assert 1 <= r.max_rank <= 53

    est = hll_estimate(spark, SF_SMOKE).first()
    assert est.rel_err < 0.10


def test_kmv_properties(spark):
    """KMV semantics: the distinct-user estimate is within the
    standard error (~1/sqrt(K) ≈ 12.5% at K=64, allow 3σ) whenever
    estimation actually kicks in, and EXACT when the sketch holds the
    whole key set (n_sk < K ⇒ every hash is retained). The overlap
    estimator's Jaccard lands within 3σ of the exact value and the
    bottom-K compiles to TakeOrderedAndProject (per-partition K-heaps,
    no global sort) — the property that makes it a sketch at scale."""
    from data_pipeline_and_visualization_dashboard_spark.extras.sketches import (
        KMV_OVL_K, kmv_estimate, kmv_overlap,
    )

    est = kmv_estimate(spark, SF_SMOKE).first()
    assert est.rel_err <= 3 * (1 / 64**0.5)

    ovl = kmv_overlap(spark, SF_SMOKE).first()
    assert 0.0 <= ovl.jacc_est <= 1.0
    assert abs(ovl.jacc_est - ovl.jacc_exact) <= 3 * (1 / KMV_OVL_K**0.5)
    # intersection estimate is jaccard_est-scaled: same error envelope
    assert ovl.inter_est >= 0.0

    plan = (
        kmv_overlap(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bloom_properties(spark):
    """Bloom semantics on real data: ZERO false negatives (the
    structural guarantee — every member passes), the measured fp rate
    stays within 3x the theoretical (1 - e^(-K/BPK))^K for the
    adaptive bits-per-key sizing, and the probe side joins the bit
    set as a BROADCAST (the whole point: the big side never shuffles
    to be pre-filtered)."""
    import math

    from data_pipeline_and_visualization_dashboard_spark.extras.sketches import (
        BLOOM_BPK, BLOOM_K, bloom_bits, bloom_prefilter,
    )

    r = bloom_prefilter(spark, SF_CORRECT).first()
    assert r.n_missed == 0
    assert r.n_pass >= r.n_members
    theo = (1 - math.exp(-BLOOM_K / BLOOM_BPK)) ** BLOOM_K
    assert r.fp_rate <= 3 * theo
    # the filter itself is bounded by its width policy
    n_bits = bloom_bits(spark, SF_CORRECT).count()
    assert n_bits <= max(64, r.n_members * BLOOM_BPK)

    plan = (
        bloom_prefilter(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_approx_percentile_guard_holds(spark):
    """q83's in-plan rank-interval contract must hold at both local
    SFs (the ad-hoc three-SF check, pinned): 5 event types, every
    row passed, rank fractions within eps of their targets."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        _PCTL_EPS,
        q83_approx_percentile_guard,
    )

    for sf in (SF_SMOKE, SF_CORRECT):
        rows = q83_approx_percentile_guard(spark, sf).collect()
        assert len(rows) == 5
        assert all(r.passed for r in rows)
        for r in rows:
            slack = _PCTL_EPS + 2.0 / r.n
            assert abs(r.p50_rank_frac - 0.5) <= slack
            assert abs(r.p95_rank_frac - 0.95) <= slack


def test_profile_approx_error_bounds(spark):
    """q61's approx=True mode must agree with the exact profile on
    everything that is NOT estimated (null counts, numeric min/max —
    bit-identical) and land its HLL n_distinct within the sketch's
    error envelope (3σ at σ = 1.04/√256 ≈ 6.5%; small cardinalities
    ride linear counting, whose noise at n≈0.4·M is a few percent —
    observed 6% on props at sf0.001 — so the same 3σ bound covers
    both regimes). The value column is additionally quantized to 6dp
    by the canonical hash key, which can only LOWER its count."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        q61_profile_events,
        q61_profile_events_approx_xxhash,
    )

    exact = {
        r.col_name: r
        for r in q61_profile_events(spark, SF_SMOKE).collect()
    }
    variants = {
        "md5": q61_profile_events(spark, SF_SMOKE, approx=True),
        "xxhash64": q61_profile_events_approx_xxhash(spark, SF_SMOKE),
    }
    sigma3 = 3 * 1.04 / 256**0.5
    for impl, df in variants.items():
        approx = {r.col_name: r for r in df.collect()}
        assert set(exact) == set(approx)
        for c, ex in exact.items():
            ap = approx[c]
            assert ap.n_nulls == ex.n_nulls, (impl, c)
            assert ap.min_num == ex.min_num, (impl, c)
            assert ap.max_num == ex.max_num, (impl, c)
            true_nd = ex.n_distinct
            assert abs(ap.n_distinct - true_nd) <= max(
                2, sigma3 * true_nd
            ), f"{impl}/{c}: approx {ap.n_distinct} vs exact {true_nd}"


def _reference_bpe(word_freqs, n_merges):
    """Textbook BPE trainer (Sennrich et al. 2016, fig. 1 shape):
    dict-of-tuples state, recount pairs after every merge, greedy
    left-to-right application. Independent of the SQL representation —
    checks the ALGORITHM, not just Spark-vs-DuckDB agreement."""
    state = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        new_state = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + f
        state = new_state
    return merges


def test_bpe_train_matches_reference_implementation(spark):
    """The distributed trainer must reproduce textbook BPE exactly:
    same merges, same ranks, same weighted pair counts — including the
    greedy left-to-right application the doubled-separator replace
    encodes. Also pins the apply-side invariants: merged token counts
    never exceed character counts and never fall below 1 per word."""
    import re

    from data_pipeline_and_visualization_dashboard_spark.extras.bpe import (
        N_MERGES, bpe_apply, train_bpe_merges,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    docs = read_table(spark, SF_SMOKE, "documents", ["doc_id", "text"])
    rows = docs.collect()
    freqs = {}
    for r in rows:
        if r.text is None:
            continue
        for w in re.split(r"\s+", r.text.strip().lower()):
            if re.fullmatch("[a-z]+", w):
                freqs[w] = freqs.get(w, 0) + 1
    expected = _reference_bpe(freqs, N_MERGES)
    got = train_bpe_merges(spark, SF_SMOKE, N_MERGES)
    assert got == expected

    per_doc = {r.doc_id: r for r in bpe_apply(spark, SF_SMOKE).collect()}
    for r in rows:
        if r.text is None:
            continue
        words = [
            w
            for w in re.split(r"\s+", r.text.strip().lower())
            if re.fullmatch("[a-z]+", w)
        ]
        if not words:
            continue
        out = per_doc[r.doc_id]
        assert out.n_words == len(words)
        assert len(words) <= out.n_tokens <= sum(len(w) for w in words)


def test_bpe_batched_trainer_exact_under_ties(spark, tmp_path):
    """Focused pin for the r17 batched trainer (one pair-count scan
    may accept SEVERAL merges): the provably-dangerous inputs are
    exact-count TIES a batch-stale pair could win lexicographically,
    and merges that re-create an already-existing symbol (the l+r
    guard).  A dense 2-letter vocab with engineered tied frequencies
    maximizes both; the textbook reference decides what exact means.
    The real-corpus agreement is pinned separately by
    test_bpe_train_matches_reference_implementation."""
    from data_pipeline_and_visualization_dashboard_spark.extras.bpe import (
        train_bpe_merges,
    )

    freqs = {
        "abab": 6, "baba": 6, "aabb": 6, "bbaa": 6,
        "abba": 5, "baab": 5, "aaaa": 4, "bbbb": 4,
        "ab": 3, "ba": 3, "aa": 2, "bb": 2,
    }
    docs = [(i, " ".join([w] * f)) for i, (w, f) in enumerate(freqs.items())]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    expected = _reference_bpe(freqs, 10)
    got = train_bpe_merges(spark, str(tmp_path), 10)
    assert got == expected


def test_bpe_compression_curve_properties(spark):
    """Round 0 must equal total character count (every char its own
    symbol), each merge strictly reduces total tokens (the arg-max
    pair has positive count), and chars-per-token grows monotonically
    — the gate a tokenizer-training pipeline reads off this curve."""
    from data_pipeline_and_visualization_dashboard_spark.extras.bpe import (
        bpe_compression,
    )

    rows = sorted(
        bpe_compression(spark, SF_SMOKE).collect(),
        key=lambda r: r.merge_rank,
    )
    assert rows[0].merge_rank == 0
    expected_chars = round(rows[0].chars_per_token * rows[0].total_tokens)
    assert rows[0].total_tokens == expected_chars  # 1 char = 1 token
    toks = [r.total_tokens for r in rows]
    assert all(a > b for a, b in zip(toks, toks[1:]))
    cpt = [r.chars_per_token for r in rows]
    assert all(a < b for a, b in zip(cpt, cpt[1:]))


def test_corpus_funnel_hash_family_invariant(spark):
    """The funnel accounting must be identical under the md5 (oracle)
    and xxhash64 (production) hash families: every stage except LSH
    candidate generation is hash-independent, and the exact-Jaccard
    verification re-derives the same near-dup pairs as long as the
    bands surface them — the property that licenses benching the fast
    family while the md5 twin carries the correctness gate."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        corpus_funnel,
    )

    md5 = corpus_funnel(spark, SF_SMOKE).first().asDict()
    xx = corpus_funnel(spark, SF_SMOKE, hash_impl="xxhash64").first().asDict()
    assert md5 == xx
    assert md5["docs_out"] > 0


def test_resize_chains_into_feature_extraction(spark):
    """Resize plumbing: output length honors the stride contract
    (ceil(n/stride) <= target+1), checksums are deterministic across
    runs, and the resized binary column chains directly into
    extract_media_features (the decode->resize->featurize pipeline
    shape)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.multimodal import (
        RESIZE_TARGET, attach_fake_media, extract_media_features,
        resize_media,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    docs = read_table(spark, SF_SMOKE, "documents", ["doc_id", "text"])
    media = attach_fake_media(docs)
    resized = resize_media(media)
    rows = {r.doc_id: r for r in resized.collect()}
    assert len(rows) == docs.count()
    for r in rows.values():
        assert r.out_bytes == len(r.resized)
        assert r.out_bytes <= RESIZE_TARGET + 1
        assert (r.stride == 1) == (r.in_bytes <= RESIZE_TARGET)
    again = {r.doc_id: r.checksum for r in resize_media(media).collect()}
    assert again == {k: v.checksum for k, v in rows.items()}

    chained = extract_media_features(
        resized.selectExpr(
            "doc_id", "resized AS media_bytes",
            "'image/fake-small' AS media_type",
        )
    )
    feats = chained.collect()
    assert len(feats) == len(rows)
    for f in feats:
        assert f.n_bytes == rows[f.doc_id].out_bytes
        assert len(f.feat) > 0


def test_incremental_pairs_equal_full_restricted(spark):
    """The incremental (delta-vs-all) pipeline must produce EXACTLY the
    full pipeline's pairs restricted to delta-touching ones — same
    candidates (shared capped band buckets), same verification values."""
    full = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in dedup.dedup_minhash_pairs(spark, SF_SMOKE).collect()
        if r.doc_id_a % 10 == 0 or r.doc_id_b % 10 == 0
    }
    inc = {
        (r.doc_id_a, r.doc_id_b, r.jaccard)
        for r in dedup.dedup_incremental_pairs(spark, SF_SMOKE).collect()
    }
    assert inc == full and len(inc) > 0

def test_pq_codebook_cache_invalidates_on_regenerated_corpus(spark, tmp_path):
    """The codebook cache keys on the embeddings file mtime: when the
    corpus parquet is regenerated in place (the harness does this
    between rounds), the stale codebook must be evicted, and a corpus
    missing the sampled vec_ids must fail loudly, not KeyError."""
    import time

    from data_pipeline_and_visualization_dashboard_spark.extras import (
        similarity as sim,
    )

    d = str(tmp_path)

    def write_corpus(scale):
        rows = [
            (i, [float((i * 7 + j) % 13) * scale for j in range(64)])
            for i in range(sim.PQ_CODES + 4)
        ]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).coalesce(1).write.mode("overwrite").parquet(d + "/embeddings.parquet")

    write_corpus(1.0)
    c1 = sim._pq_codebook(spark, d)
    assert sim._pq_codebook(spark, d) is c1  # cache hit, same generation
    time.sleep(0.05)
    write_corpus(3.0)  # regenerate in place -> new mtime, new values
    c2 = sim._pq_codebook(spark, d)
    assert c2 is not c1 and c2 != c1
    assert len([k for k in sim._PQ_CODEBOOK_CACHE if k[0] == d]) == 1

    # corpus whose first PQ_CODES vec_ids are not all present
    spark.createDataFrame(
        [(i + 100, [float(i + j) for j in range(64)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(d + "/embeddings.parquet")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="missing"):
        sim._pq_codebook(spark, d)

def test_hash_stage_md5_matches_duck_and_xxhash_counts(spark, duck):
    """Isolated base-hash stage: the md5 family reproduces in DuckDB
    value-for-value; the xxhash64 family shares every hash-independent
    column (per-doc shingle count) with the md5 twin."""
    from data_pipeline_and_visualization_dashboard_spark.extras import dedup

    s = {tuple(r) for r in dedup.dedup_hash_stage_md5(spark, SF_CORRECT).collect()}
    d = {tuple(r) for r in duck.execute(dedup._DUCK_HASH_STAGE_SQL).fetchall()}
    assert s == d and len(s) > 0
    x = {
        (r.doc_id, r.n_shingles)
        for r in dedup.dedup_hash_stage_xxhash(spark, SF_CORRECT).collect()
    }
    assert x == {(a, n) for (a, n, *_rest) in s}

def test_pretrained_ivf_serving_equals_retrained(spark):
    """The cached-index serving paths must return exactly what the
    self-training variants return (training is deterministic — only
    WHERE it runs changes), and the index cache must hit."""
    from data_pipeline_and_visualization_dashboard_spark import queries_ext as qx

    assert qx.ivf_index(spark, SF_SMOKE) is qx.ivf_index(spark, SF_SMOKE)
    a = sorted(tuple(r) for r in qx.sim_ivf_topk(spark, SF_SMOKE).collect())
    b = sorted(
        tuple(r)
        for r in qx.sim_ivf_topk_pretrained(spark, SF_SMOKE).collect()
    )
    assert a == b and len(a) > 0
    c = sorted(tuple(r) for r in qx.sim_ivfpq_topk(spark, SF_SMOKE).collect())
    d = sorted(
        tuple(r)
        for r in qx.sim_ivfpq_topk_pretrained(spark, SF_SMOKE).collect()
    )
    assert c == d and len(c) > 0

def test_scrub_pii_on_planted_corpus(spark, tmp_path):
    """PII scrub semantics on PLANTED data (the driver corpus has no
    PII, so its oracle row only pins mechanics): emails, phones and
    long digit ids are redacted and counted per rule; clean docs pass
    through untouched."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        PII_TOKEN,
        scrub_pii,
    )

    rows = [
        (1, "contact me at alice.smith+x@example.co.uk for details"),
        (2, "call +1 (555) 123-4567 or 555 987 6543 now"),
        (3, "order id 123456789 shipped; ref 00012345"),
        (4, "nothing sensitive here at all"),
        (5, "bob@test.io says id 9876543 works"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in scrub_pii(spark, d).collect()}
    assert out[1].n_email == 1 and PII_TOKEN in out[1].clean_text
    assert "alice" not in out[1].clean_text
    assert out[2].n_phone == 2 and "4567" not in out[2].clean_text
    # 123456789 hits digit_id; 00012345 too
    assert out[3].n_digit_id == 2 and "123456789" not in out[3].clean_text
    assert out[4].clean_text == rows[3][1]
    assert out[4].n_email == out[4].n_phone == out[4].n_digit_id == 0
    assert out[5].n_email == 1 and out[5].n_digit_id == 1
    assert "bob@test.io" not in out[5].clean_text


def test_mix_sample_respects_budgets_and_determinism(spark, duck):
    """Domain mixing invariants: per-source kept tokens never exceed
    the integer budget, every source with a positive budget gets docs,
    and the selection is deterministic (two runs identical)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        MIX_DEN,
        MIX_NUM,
        mix_sample,
    )

    out = mix_sample(spark, SF_CORRECT)
    rows = out.collect()
    again = mix_sample(spark, SF_CORRECT).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    kept_by_src = {}
    for r in rows:
        kept_by_src[r.source] = kept_by_src.get(r.source, 0) + r.n_tokens
    budgets = dict(
        duck.execute(
            f"""
        WITH base AS (
          SELECT source,
                 sum(len(string_split_regex(lower(trim(text)), '\\s+')))
                     AS st,
                 (CAST(substr(source, 4) AS INT) % 3) + 1 AS w
          FROM documents GROUP BY source, 3
        ), t AS (SELECT sum(st) AS t, sum(w) AS sw FROM base)
        SELECT source,
               (CAST({MIX_NUM} AS BIGINT) * t.t * w)
                   // (CAST({MIX_DEN} AS BIGINT) * t.sw)
        FROM base, t
        """
        ).fetchall()
    )
    assert set(kept_by_src) <= set(budgets)
    for src, kept in kept_by_src.items():
        assert kept <= budgets[src], src
    assert all(b == 0 or s in kept_by_src for s, b in budgets.items())
    # weighted: total kept is close to (but never over) the global cap
    total_kept = sum(kept_by_src.values())
    total_budget = sum(budgets.values())
    assert 0 < total_kept <= total_budget


def test_semantic_dedup_survivor_rule(spark):
    """SemDeDup survivor invariants at smoke SF: the lowest vec_id of
    every cluster is always kept; a dropped vector has a kept-or-
    dropped lower-id cluster-mate above threshold (the rule is
    'any lower-id neighbor', not 'kept neighbor' — one-pass, not
    iterative); centroid self-similarity never drops a centroid's own
    lowest id."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        dedup_semantic,
    )

    rows = dedup_semantic(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.kept, f"cluster {cid} lowest id must survive"

def test_semantic_dedup_trained_variant_invariants(spark):
    """The trained-cluster SemDeDup composition keeps the survivor
    invariant (lowest vec_id per cluster survives) and covers the
    whole corpus exactly once."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        dedup_semantic_trained,
    )

    rows = dedup_semantic_trained(spark, SF_SMOKE).collect()
    assert len(rows) == len({r.vec_id for r in rows}) > 0
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert min(members, key=lambda r: r.vec_id).kept, cid

def test_line_dedup_on_planted_corpus(spark, tmp_path):
    """Line-dedup semantics on planted data: a doc repeating another
    doc's line loses exactly that window's tokens; the first occurrence
    (lowest doc_id, line_idx) keeps everything; unique docs untouched."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        LINE_TOKENS,
        line_dedup,
    )

    boiler = " ".join(f"w{i}" for i in range(LINE_TOKENS))
    uniq_a = " ".join(f"a{i}" for i in range(LINE_TOKENS))
    uniq_b = " ".join(f"b{i}" for i in range(LINE_TOKENS))
    rows = [
        (1, f"{boiler} {uniq_a}"),       # first occurrence: keeps all
        (2, f"{boiler} {uniq_b}"),       # dup of line 0 of doc 1
        (3, f"{boiler} {boiler}"),       # two dups (both windows)
        (4, "totally unique text here"),  # short doc, one partial line
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in line_dedup(spark, d).collect()}
    assert out[1].n_dup_lines == 0 and out[1].tokens_removed == 0
    assert out[2].n_dup_lines == 1
    assert out[2].tokens_removed == LINE_TOKENS
    assert out[3].n_dup_lines == 2
    assert out[3].tokens_removed == 2 * LINE_TOKENS
    assert out[4].n_dup_lines == 0 and out[4].n_lines == 1

def test_semantic_blas_pair_stage_equals_hof(spark):
    """The Arrow/BLAS within-cluster drop must produce EXACTLY the HOF
    drop set on the same clusters — same unit vectors, same 6dp round,
    same lower-id rule (this is what licenses the fast path in
    dedup_semantic_trained)."""
    from pyspark.sql import functions as F

    from data_pipeline_and_visualization_dashboard_spark.extras import dedup
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    emb = read_table(spark, SF_SMOKE, "embeddings", ["vec_id", "embedding"])
    e = F.col("embedding").cast("array<double>")
    vecs = emb.repartition(4, "vec_id").select("vec_id", e.alias("v"))
    cents = emb.filter(F.col("vec_id").isin(dedup.SEM_CENTROID_IDS)).select(
        F.col("vec_id").cast("int").alias("cluster_id"), e.alias("cv")
    )
    hof = {
        tuple(r)
        for r in dedup._semantic_from_clusters(vecs, cents).collect()
    }
    blas = {
        tuple(r)
        for r in dedup._semantic_from_clusters(
            vecs, cents, pair_impl="blas"
        ).collect()
    }
    assert hof == blas and len(hof) > 0


def test_lsss_components_equal_min_label_propagation(spark):
    """The web-scale large-star/small-star CC must land on EXACTLY the
    same (doc_id, group_id) set as the min-label loop — same verified
    pair graph, same component-min contract (the shared DuckDB oracle
    checks values; this pins the two Spark variants against each other
    including on the smoke corpus the oracle never sees)."""
    for sf in (SF_SMOKE, SF_CORRECT):
        a = {
            tuple(r)
            for r in dedup.dedup_neardup_groups(spark, sf).collect()
        }
        b = [
            tuple(r)
            for r in dedup.dedup_neardup_groups_lsss(spark, sf).collect()
        ]
        assert len(b) == len(set(b))  # star fixpoint: one row per node
        assert set(b) == a and len(a) > 0


def test_dup_ngrams_on_planted_corpus(spark, tmp_path):
    """Repeated-span accounting on planted data: byte-identical copies
    score dup_frac 1.0, a doc sharing only a leading block is flagged
    for exactly that block's spans, unique docs score 0, and a short
    doc falls back to one whole-text gram."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        DUP_NGRAM_N,
        dup_ngrams,
    )

    shared = " ".join(f"s{i}" for i in range(DUP_NGRAM_N + 3))  # 8 words
    tail = " ".join(f"t{i}" for i in range(20))
    rows = [
        (1, f"{shared} {tail}"),  # shares its leading block with 2, 3
        (2, f"{shared} {tail}"),  # exact copy of 1 -> dup_frac 1.0
        (3, f"{shared} different ending entirely here now"),
        (4, "no overlap with anything else at all in this doc"),
        (5, "tiny"),  # < n tokens: whole-text fallback gram
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in dup_ngrams(spark, d).collect()}
    # docs 1 and 2 are identical: every span duplicated
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    # doc 3 shares exactly the grams fully inside the 8-word block:
    # 8 - 5 + 1 = 4 of them
    assert out[3].n_dup_ngrams == 4 and 0 < out[3].dup_frac < 1
    assert out[4].n_dup_ngrams == 0 and out[4].dup_frac == 0.0
    assert out[5].n_ngrams == 1 and out[5].n_dup_ngrams == 0
    assert all(r.n_dup_ngrams <= r.n_ngrams for r in out.values())


def test_dup_spans_merges_maximal_runs(spark, tmp_path):
    """Span-level exact-substring semantics on planted data: adjacent
    duplicated gram windows merge into ONE maximal span covering
    [first_start, last_start + n - 1]; two shared blocks separated by
    unique text yield TWO spans; a within-doc-only repeat is NOT a
    cross-doc dup; span-free and sub-n docs don't appear."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        DUP_NGRAM_N as n,
        dup_spans,
    )

    block_a = " ".join(f"a{i}" for i in range(n + 3))  # 8 tokens
    block_b = " ".join(f"b{i}" for i in range(n))      # 5 tokens
    mid = " ".join(f"m{i}" for i in range(6))
    twice = " ".join(f"r{i}" for i in range(n))
    rows = [
        # doc 1: A ... B -> two maximal spans (8 tokens, 5 tokens)
        (1, f"{block_a} {mid} {block_b}"),
        (2, f"{block_a} completely different tail words here"),
        (3, f"unrelated head words go here {block_b}"),
        # doc 4: repeats its own block twice, shared with NOBODY
        (4, f"{twice} xx yy zz {twice}"),
        (5, "tiny"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(d + "/documents.parquet")
    out = {r.doc_id: r for r in dup_spans(spark, d).collect()}
    assert set(out) == {1, 2, 3}  # 4: within-doc only; 5: sub-n
    assert out[1].n_spans == 2
    assert out[1].dup_tokens == (n + 3) + n
    assert out[1].longest_span == n + 3
    assert out[2].n_spans == 1 and out[2].dup_tokens == n + 3
    assert out[3].n_spans == 1 and out[3].dup_tokens == n


def test_quality_score_matches_hand_computed_weights(spark, tmp_path):
    """The hashing-trick scorer on a planted doc must equal the weight
    sum computed independently in Python from the same md5 formula —
    pins the whole bucket->weight derivation, not just engine parity."""
    import hashlib

    from data_pipeline_and_visualization_dashboard_spark.extras.hashing import M31
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        QS_DIM,
        quality_score,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % M31

    words = ["alpha", "beta", "gamma", "alpha"]
    expected = 0.0
    for wd in words:
        bucket = h(wd) % QS_DIM
        expected += (h(f"qw{bucket}") % 2001 - 1000) / 1000.0
    d = str(tmp_path)
    spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    ).write.parquet(d + "/documents.parquet")
    row = quality_score(spark, d).collect()[0]
    assert row.token_cnt == 4
    assert abs(row.score_sum - expected) < 1e-12
    assert row.kept == (row.score_mean > 0)


def test_dsir_weights_prefer_target_language(spark):
    """DSIR importance weights exist to up-weight target-looking docs:
    the mean per-feature log ratio of 'en' docs must exceed that of
    non-'en' docs on the real corpus (by construction of the target
    profile), and every doc must carry finite weights."""
    import math

    from data_pipeline_and_visualization_dashboard_spark.extras.text import dsir_weights
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    langs = {
        r.doc_id: r.lang
        for r in read_table(
            spark, SF_CORRECT, "documents", ["doc_id", "lang"]
        ).collect()
    }
    rows = dsir_weights(spark, SF_CORRECT).collect()
    assert all(math.isfinite(r.log_weight) for r in rows)
    en = [r.weight_per_feat for r in rows if langs[r.doc_id] == "en"]
    other = [r.weight_per_feat for r in rows if langs[r.doc_id] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_incremental_exact_agrees_with_exact_groups(spark):
    """The incremental exact tier must agree with the batch exact
    dedup: a delta doc labeled dup_of_base/dup_in_delta shares its
    content-hash group with its dup_of; a 'new' doc is its own group's
    keeper. Also pins the delta convention (doc_id % 10 == 0)."""
    groups = {
        r.keeper_doc_id: r.n_copies
        for r in dedup.dedup_exact_groups(spark, SF_CORRECT).collect()
    }
    keeper_of = {}
    docs = read_table(spark, SF_CORRECT, "documents", ["doc_id", "text"])
    hashed = {
        r.doc_id: r.h
        for r in docs.selectExpr("doc_id", "md5(text) AS h").collect()
    }
    by_hash = {}
    for d, h in sorted(hashed.items()):
        by_hash.setdefault(h, d)
        keeper_of[d] = by_hash[h]
    rows = dedup.dedup_incremental_exact(spark, SF_CORRECT).collect()
    assert rows and all(r.doc_id % 10 == 0 for r in rows)
    for r in rows:
        if r.verdict == "new":
            assert r.dup_of is None
            assert keeper_of[r.doc_id] == r.doc_id
        else:
            assert hashed[r.dup_of] == hashed[r.doc_id]
            assert r.dup_of < r.doc_id
            if r.verdict == "dup_of_base":
                assert r.dup_of % 10 != 0
            else:
                assert r.dup_of % 10 == 0


def test_gopher_rules_on_planted_docs(spark, tmp_path):
    """Each Gopher rule must fire on a doc built to violate exactly
    it (plus the incidental word-count/stopword interactions, which
    the expectations account for)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import gopher_rules

    good = ("the quick brown fox jumps with the energy of beasts that "
            "have been to many places and the show goes on nicely")
    bullets = "\n".join(f"- item {i} of the list to have" for i in range(10))
    symbols = ("the " * 12) + "# # # # # # #"
    ellipsis = "\n".join(
        f"the line {i} of the doc that we have trails off..." for i in range(5)
    )
    nonalpha = " ".join(str(i) for i in range(30))
    rows = [
        (1, good), (2, bullets), (3, symbols), (4, ellipsis), (5, nonalpha),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        d + "/documents.parquet"
    )
    out = {r.doc_id: r for r in gopher_rules(spark, d).collect()}
    assert out[1].passes and out[1].n_rules_failed == 0
    assert out[2].bullet_frac == 1.0 and not out[2].passes
    assert out[3].symbol_ratio > 0.1 and not out[3].passes
    assert out[4].ellipsis_frac == 1.0 and not out[4].passes
    assert out[5].alpha_word_frac == 0.0 and not out[5].passes


def test_recall_eval_matches_pytest_computed_recall(spark):
    """The recall operator must reproduce the recall the test harness
    computes directly from the two top-k outputs (same corpus, same
    tie-breaks) — and LSH recall must be positive but imperfect on the
    near-uniform synthetic corpus (all-1.0 would mean the bucket
    pruning isn't actually pruning)."""
    bf = {}
    for r in similarity.cosine_topk(spark, SF_SMOKE).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh = {}
    for r in similarity.lsh_topk(spark, SF_SMOKE).collect():
        lsh.setdefault(r.query_id, set()).add(r.neighbor_id)
    rows = {r.query_id: r for r in
            similarity.recall_eval(spark, SF_SMOKE).collect()}
    assert set(rows) == set(bf)
    total_hits = 0
    for q, exact in bf.items():
        hits = len(exact & lsh.get(q, set()))
        assert rows[q].n_exact == len(exact)
        assert rows[q].n_hits == hits
        assert abs(rows[q].recall - hits / len(exact)) < 1e-12
        total_hits += hits
    assert 0 < total_hits < sum(len(v) for v in bf.values())


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multiprobe exists to raise recall: probing the 8 Hamming-1
    buckets must recover at least every pair single-probe finds (its
    candidate set is a superset), and strictly more true neighbors on
    this corpus; per-pair sims stay identical."""
    bf = {}
    for r in similarity.cosine_topk(spark, SF_SMOKE).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    single = {}
    for r in similarity.lsh_topk(spark, SF_SMOKE).collect():
        single.setdefault(r.query_id, set()).add(r.neighbor_id)
    multi = {}
    for r in similarity.lsh_multiprobe_topk(spark, SF_SMOKE).collect():
        multi.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits_s = sum(len(bf[q] & single.get(q, set())) for q in bf)
    hits_m = sum(len(bf[q] & multi.get(q, set())) for q in bf)
    assert hits_m > hits_s, (hits_s, hits_m)


def test_corpus_to_training_shards_composition(spark, tmp_path):
    """The whole curation-to-training-prep chain composed for real:
    survivors of the dedup funnel are materialized as their own corpus,
    then chunked, packed, and split — with conservation invariants at
    every hop (only survivor docs appear; chunk counts match the
    chunking formula; packing conserves chunk counts; every surviving
    doc gets exactly one split)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        corpus_survivors,
    )
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        chunks,
        packing,
        split_assign,
    )

    surv = {r.doc_id for r in corpus_survivors(spark, SF_SMOKE).collect()}
    assert surv
    docs = read_table(spark, SF_SMOKE, "documents")
    d = str(tmp_path)
    docs.filter(F.col("doc_id").isin(surv)).coalesce(2).write.parquet(
        d + "/documents.parquet"
    )
    ch = chunks(spark, d).collect()
    assert {r.doc_id for r in ch} == surv
    per_doc = {}
    for r in ch:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    pk = packing(spark, d).collect()  # pack-grain fill stats
    assert sum(r.n_chunks for r in pk) == len(ch)  # chunks conserved
    assert sum(r.n_tokens for r in pk) == sum(
        r.n_chunk_tokens for r in ch
    )  # tokens conserved
    sp = {r.doc_id: r.split for r in split_assign(spark, d).collect()}
    assert set(sp) == surv
    assert set(sp.values()) <= {"train", "val", "test"}
    # the split must be the same assignment the full corpus would give
    # (hash of doc_id only — stability under corpus filtering)
    full = {r.doc_id: r.split for r in
            split_assign(spark, SF_SMOKE).collect()}
    assert all(full[d_] == s for d_, s in sp.items())
    # final hop: tokenize the surviving corpus with merges trained on
    # the FULL corpus (the production order — the tokenizer artifact
    # predates filtering) and check the accounting composes: every
    # surviving doc gets a token count, bounded by chars, and the
    # count is identical to the same doc's count in the full-corpus
    # tokenization (per-doc tokenization is corpus-independent given
    # fixed merges)
    from data_pipeline_and_visualization_dashboard_spark.extras.bpe import (
        _trained_merges, bpe_apply,
    )
    from data_pipeline_and_visualization_dashboard_spark.streaming import (
        tokenize_stream,
    )

    merges = _trained_merges(spark, SF_SMOKE)
    surv_docs = docs.filter(F.col("doc_id").isin(surv)).select(
        "doc_id", "text"
    )
    tok = {
        r.doc_id: r.n_tokens
        for r in tokenize_stream(surv_docs, merges).collect()
    }
    assert set(tok) == surv
    full_tok = {
        r.doc_id: r.n_tokens for r in bpe_apply(spark, SF_SMOKE).collect()
    }
    assert all(full_tok[d_] == t for d_, t in tok.items())


def test_rp_topk_recall_floor_and_centroid_sanity(spark):
    """JL projection to 32 dims must keep projected-space top-k
    correlated with exact cosine (measured 0.24 on the adversarial
    near-uniform corpus; random would be ~0.02), and the per-language
    centroids must average exactly the member vectors (checked for one
    (lang, dim) cell by hand)."""
    bf = {}
    for r in similarity.cosine_topk(spark, SF_SMOKE).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    rp = {}
    for r in similarity.rp_topk(spark, SF_SMOKE).collect():
        rp.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf[q] & rp.get(q, set())) for q in bf)
    total = sum(len(v) for v in bf.values())
    assert hits / total >= 0.15, hits / total

    cents = {
        (r.lang, r.dim): (r.centroid_val, r.n_vecs)
        for r in similarity.lang_centroids(spark, SF_SMOKE).collect()
    }
    docs = {
        r.doc_id: r.lang
        for r in read_table(
            spark, SF_SMOKE, "documents", ["doc_id", "lang"]
        ).collect()
    }
    embs = read_table(
        spark, SF_SMOKE, "embeddings", ["vec_id", "embedding"]
    ).collect()
    lang0 = next(iter({v for v in docs.values()}))
    members = [
        list(r.embedding) for r in embs if docs.get(r.vec_id) == lang0
    ]
    want = round(sum(m[0] for m in members) / len(members), 6)
    got, n = cents[(lang0, 0)]
    assert n == len(members)
    assert abs(got - want) < 1e-5


def test_lm_logprob_ranks_fluent_above_gibberish(spark, tmp_path):
    """The LM scorer's whole purpose: a doc built from the corpus's
    most common bigrams must out-score a doc of singleton gibberish
    (higher mean conditional log-prob), and each bigram count/row is
    accounted (n_bigrams = token count - 1)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.text import lm_logprob

    common = "the cat sat on the mat " * 10
    rows = [
        (1, common.strip()),
        (2, common.strip()),  # reinforce the common bigrams
        (3, "zq xv qn wj kp dz yb mf tg rh"),  # singletons everywhere
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        d + "/documents.parquet"
    )
    out = {r.doc_id: r for r in lm_logprob(spark, d).collect()}
    assert out[1].n_bigrams == 59 and out[3].n_bigrams == 9
    assert out[1].avg_logprob > out[3].avg_logprob


def test_search_family_semantics(spark):
    """Retrieval semantics against a hand-rolled Python index on the
    smoke corpus: AND results are exactly the docs containing every
    query term; phrase counts equal the adjacent-bigram occurrence
    counts; ranked results score only query terms and order by score
    with the doc_id tiebreak."""
    import re

    from data_pipeline_and_visualization_dashboard_spark.extras.search import (
        PHRASE, QUERY_AND, search_and, search_phrase, search_ranked,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    corpus = {}
    for r in read_table(spark, SF_SMOKE, "documents", ["doc_id", "text"]).collect():
        if r.text is None:
            continue
        corpus[r.doc_id] = [
            w
            for w in re.split(r"\s+", r.text.strip().lower())
            if re.fullmatch("[a-z]+", w)
        ]

    want_and = {
        d: sum(w in QUERY_AND for w in toks)
        for d, toks in corpus.items()
        if all(t in toks for t in QUERY_AND)
    }
    got_and = {r.doc_id: r.n_hits for r in search_and(spark, SF_SMOKE).collect()}
    assert got_and == want_and

    want_ph = {}
    for d, toks in corpus.items():
        c = sum(
            1
            for a, b in zip(toks, toks[1:])
            if (a, b) == PHRASE
        )
        if c:
            want_ph[d] = c
    got_ph = {
        r.doc_id: r.n_phrase for r in search_phrase(spark, SF_SMOKE).collect()
    }
    assert got_ph == want_ph

    ranked = search_ranked(spark, SF_SMOKE).collect()
    assert 0 < len(ranked) <= 10
    keys = [(-r.score, r.doc_id) for r in ranked]
    assert keys == sorted(keys)


def test_contamination_multi_and_survivor_policy(spark):
    """Multi-benchmark screen: every training doc gets exactly one row
    per benchmark (zero-overlap rows included), ratios in [0,1], and
    the per-set flags fire somewhere on the planted dup corpus.
    Survivor policy: the chosen survivor carries its component's max
    quality score (min doc_id on ties) and components have >= 2
    members by construction."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        CONTAM_EVAL_MODS, contamination_multi, dedup_neardup_groups,
        survivor_policy,
    )
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        quality_score,
    )

    rows = contamination_multi(spark, SF_SMOKE).collect()
    per_doc = {}
    for r in rows:
        assert 0.0 <= r.overlap_ratio <= 1.0
        assert r.eval_set in {f"bench{m}" for m in CONTAM_EVAL_MODS}
        per_doc.setdefault(r.doc_id, set()).add(r.eval_set)
    assert per_doc
    for d, sets in per_doc.items():
        assert len(sets) == len(CONTAM_EVAL_MODS)
        assert d % 10 not in CONTAM_EVAL_MODS

    scores = {r.doc_id: r.score_mean for r in quality_score(spark, SF_SMOKE).collect()}
    comps = {}
    for r in dedup_neardup_groups(spark, SF_SMOKE).collect():
        comps.setdefault(r.group_id, []).append(r.doc_id)
    surv = survivor_policy(spark, SF_SMOKE).collect()
    assert {r.group_id for r in surv} == set(comps)
    for r in surv:
        members = comps[r.group_id]
        assert r.n_members == len(members) >= 2
        best = max(members, key=lambda d: (scores[d], -d))
        assert r.survivor_id == best
        assert r.survivor_score == scores[best]


def test_cluster_table_artifact_identity_and_rebuild(spark, tmp_path):
    """cluster_table (VERDICT r14 ask #3): the materialized component
    artifact is row-identical to a fresh dedup_neardup_groups build
    (cached ≡ fresh), a second call serves from the SAME parquet
    generation without rebuilding (pinned via the artifact's mtime),
    and a corpus-mtime bump invalidates the generation (stale dir
    removed, new one built) — while generations of a DIFFERENT corpus
    that happens to share a basename are left alone (ADVICE r15 #1:
    the generation key folds a digest of the absolute path, and
    eviction parses the key exactly instead of prefix-matching)."""
    import glob
    import os

    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        _corpus_key, _documents_mtime, cluster_table,
        dedup_neardup_groups,
    )

    fresh = sorted(
        map(tuple, dedup_neardup_groups(spark, SF_SMOKE).collect())
    )
    cached = sorted(map(tuple, cluster_table(spark, SF_SMOKE).collect()))
    assert cached == fresh and len(cached) > 0

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "spark-warehouse", "cluster_table",
    )
    gen = os.path.join(
        root,
        f"{_corpus_key(SF_SMOKE)}_{_documents_mtime(SF_SMOKE)}_md5",
        "data.parquet",
    )
    assert os.path.exists(gen)
    stamp = max(os.path.getmtime(p) for p in glob.glob(gen + "/*"))
    again = sorted(map(tuple, cluster_table(spark, SF_SMOKE).collect()))
    assert again == fresh
    assert stamp == max(
        os.path.getmtime(p) for p in glob.glob(gen + "/*")
    )  # served, not rebuilt

    # stale-generation eviction: plant a fake older generation of the
    # SAME corpus-to-be (a copy under tmp_path, so its key digest
    # differs from the real testdata corpus despite the shared
    # basename) and force a rebuild by pointing at the copy
    import shutil

    corpus2 = tmp_path / "sf0.001"
    shutil.copytree(SF_SMOKE, corpus2)
    os.utime(corpus2 / "documents.parquet")  # copytree kept the mtime
    fake = os.path.join(
        root, f"{_corpus_key(str(corpus2))}_0_md5", "data.parquet"
    )
    os.makedirs(fake, exist_ok=True)
    try:
        rebuilt = sorted(
            map(tuple, cluster_table(spark, str(corpus2)).collect())
        )
        assert rebuilt == fresh  # same corpus content, same components
        assert not os.path.exists(fake)  # stale generation removed
        # the same-basename-but-different-path corpus did NOT evict
        # the real corpus's generation (the ADVICE r15 #1 collision
        # fix)
        assert os.path.exists(gen)
    finally:
        # exact-match eviction means OTHER corpora never sweep this
        # tmp corpus's generations — remove them here or every pytest
        # run leaks one (tmp_path digests never repeat)
        import shutil as _sh

        ckey2 = _corpus_key(str(corpus2))
        for d in os.listdir(root):
            if d.rsplit("_", 2)[0] == ckey2:
                _sh.rmtree(os.path.join(root, d), ignore_errors=True)


def test_survivors_table_artifact_identity(spark):
    """survivors_table (VERDICT r15 ask #4): the materialized survivor
    artifact carries exactly the corpus_survivors membership (cached ≡
    fresh), and its per-doc readouts (n_tokens, doc_hash) match a
    fresh row-local computation over the surviving documents — so the
    artifact-consuming manifest is accounting over the same facts the
    funnel chain would have produced."""
    from pyspark.sql import functions as F

    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        _token_hash_proj, corpus_survivors, survivors_table,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import (
        read_table,
    )

    art = sorted(map(tuple, survivors_table(spark, SF_SMOKE).collect()))
    assert len(art) > 0
    fresh_ids = sorted(
        r.doc_id for r in corpus_survivors(spark, SF_SMOKE).collect()
    )
    assert [r[0] for r in art] == fresh_ids
    docs = read_table(spark, SF_SMOKE, "documents", ["doc_id", "text"])
    fresh = sorted(
        map(
            tuple,
            docs.filter(F.col("doc_id").isin(fresh_ids))
            .select("doc_id", *_token_hash_proj())
            .collect(),
        )
    )
    assert art == fresh


def test_canonical_pick_prices_first_doc_policy(spark):
    """dedup_canonical_pick vs a raw Python fold of both keeper
    policies: canonical = argmax(quality, tie min doc_id) must equal
    survivor_policy's pick (same policy, windowless spelling), first =
    min doc_id (the chain's incumbent — dedup_exact_docs' keep-first),
    and the accounting invariants hold: n_dropped = n_members - 1,
    score_delta >= 0 always, and changed ⟺ delta > 0 (a tie on the
    max score breaks to the minimum doc_id, which IS the first-doc
    pick, so a changed canonical strictly improves quality)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        canonical_pick, dedup_neardup_groups, survivor_policy,
    )
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        quality_score,
    )

    scores = {
        r.doc_id: r.score_mean
        for r in quality_score(spark, SF_SMOKE).collect()
    }
    comps = {}
    for r in dedup_neardup_groups(spark, SF_SMOKE).collect():
        comps.setdefault(r.group_id, []).append(r.doc_id)
    surv = {
        r.group_id: r.survivor_id
        for r in survivor_policy(spark, SF_SMOKE).collect()
    }
    rows = canonical_pick(spark, SF_SMOKE).collect()
    assert {r.group_id for r in rows} == set(comps)
    changed_seen = False
    for r in rows:
        members = comps[r.group_id]
        best = max(members, key=lambda d: (scores[d], -d))
        first = min(members)
        assert r.canonical_id == best == surv[r.group_id]
        assert r.canonical_score == scores[best]
        assert r.first_id == first
        assert r.first_score == scores[first]
        assert r.n_members == len(members)
        assert r.n_dropped == len(members) - 1
        # compare against the RAW delta with half-quantum tolerance:
        # the engine rounds 6dp half-up while Python round() banks,
        # so exact equality against round(...) is knife-edge fragile
        # (review r14 #3)
        assert abs(
            r.score_delta - (scores[best] - scores[first])
        ) <= 5e-7
        assert r.score_delta >= 0.0
        assert r.changed == (r.canonical_id != r.first_id)
        # the true invariant at raw precision: a changed canonical
        # strictly improves quality (a tie breaks to min doc_id ==
        # the first pick); the ROUNDED delta may still read 0.0 for
        # sub-quantum improvements, so it is not asserted against
        assert r.changed == (scores[best] > scores[first])
        changed_seen = changed_seen or r.changed
    # the planted dup corpus must actually exercise the policy switch
    assert changed_seen


def test_hist_quantiles_error_bound_and_drift_nonneg(spark):
    """The histogram sketch's defining guarantee: the q-th order
    statistic lies inside the crossing bin, so the estimate is within
    one bin width of it — and within TWO bin widths of the exact
    INTERPOLATED percentile (interpolation between order statistics
    can straddle a bin boundary). The drift monitor's defining
    guarantee: KL >= 0 (Gibbs), one row per day present in the
    data."""
    from data_pipeline_and_visualization_dashboard_spark.extras.sketches import (
        HIST_BINS, hist_quantiles,
    )
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        q63_drift_kl,
    )

    vals = [
        r.value
        for r in read_table(spark, SF_SMOKE, "events", ["value"])
        .filter(F.col("value").isNotNull())
        .collect()
    ]
    bin_width = (max(vals) - min(vals)) / HIST_BINS
    rows = hist_quantiles(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.abs_err <= 2 * bin_width + 1e-9, (r, bin_width)

    drift = q63_drift_kl(spark, SF_SMOKE).collect()
    n_days = (
        read_table(spark, SF_SMOKE, "events", ["ts"])
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert len(drift) == n_days
    for r in drift:
        assert r.kl_vs_corpus >= -1e-6
        assert r.n_events > 0


def test_weighted_sample_biases_toward_heavy_rows(spark):
    """A-ES semantics: selection probability grows with weight, so the
    sample's mean value must clearly exceed the population mean, keys
    live in (0,1], and the plan is a TakeOrderedAndProject (no global
    sort, no RNG nodes)."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        q64_weighted_sample,
    )

    df = q64_weighted_sample(spark, SF_SMOKE)
    rows = df.collect()
    assert 0 < len(rows) <= 100
    for r in rows:
        assert 0.0 < r.sample_key <= 1.0
    pop = [
        r.value
        for r in read_table(spark, SF_SMOKE, "events", ["value"])
        .filter(F.col("value").isNotNull() & (F.col("value") > 0))
        .collect()
    ]
    samp_mean = sum(r.value for r in rows) / len(rows)
    pop_mean = sum(pop) / len(pop)
    assert samp_mean > 1.5 * pop_mean, (samp_mean, pop_mean)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_training_triplets_semantics(spark):
    """Contrastive-prep contract: every positive is a verified
    near-dup of its anchor (jaccard >= threshold, pair exists in the
    LSH output), and no negative shares the anchor's near-dup
    component (a false negative would poison the loss)."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        NEARDUP_JACCARD, dedup_minhash_pairs, dedup_neardup_groups,
        training_triplets,
    )

    pairs = {
        frozenset((r.doc_id_a, r.doc_id_b)): r.jaccard
        for r in dedup_minhash_pairs(spark, SF_SMOKE).collect()
        if r.jaccard >= NEARDUP_JACCARD
    }
    comp = {
        r.doc_id: r.group_id
        for r in dedup_neardup_groups(spark, SF_SMOKE).collect()
    }
    trips = training_triplets(spark, SF_SMOKE).collect()
    assert trips
    for t in trips:
        key = frozenset((t.anchor, t.positive))
        assert key in pairs and abs(pairs[key] - t.jaccard) < 1e-12
        assert comp.get(t.negative) != comp[t.anchor]
        assert t.negative not in (t.anchor, t.positive)


def test_concurrent_sessions_matches_bruteforce(spark):
    """The sweep-line concurrency must equal the O(n·m) brute force on
    the smoke corpus: for each reported start instant, count sessions
    whose [start, end] contains it (closed intervals), and the
    reported rows must be the true top-N under the same tie-break."""
    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        CONC_TOPN,
        q69_concurrent_sessions,
    )
    from data_pipeline_and_visualization_dashboard_spark.queries import (
        SESSION_GAP_US,
    )

    ev = sorted(
        (r.user_id, r.ts, r.event_id)
        for r in read_table(
            spark, SF_SMOKE, "events", ["user_id", "ts", "event_id"]
        ).collect()
    )
    # brute-force sessionization (same 30-min gap rule)
    from collections import defaultdict

    per_user = defaultdict(list)
    for uid, ts, eid in sorted(
        ev, key=lambda t: (t[0], t[1], t[2])
    ):
        us = int(ts.timestamp() * 1_000_000)
        per_user[uid].append(us)
    intervals = []
    for uid, uss in per_user.items():
        sess_no, start, prev = 0, uss[0], uss[0]
        for us in uss[1:]:
            if us - prev > SESSION_GAP_US:
                intervals.append((uid, sess_no, start, prev))
                sess_no, start = sess_no + 1, us
            prev = us
        intervals.append((uid, sess_no, start, prev))

    def conc_at(t):
        return sum(1 for _, _, s, e in intervals if s <= t <= e)

    starts = [
        (conc_at(s), s, uid, sno) for uid, sno, s, _ in intervals
    ]
    want = sorted(
        starts, key=lambda r: (-r[0], r[1], r[2], r[3])
    )[:CONC_TOPN]
    got = [
        (r.concurrent, r.ts_us, r.user_id, r.sess_no)
        for r in q69_concurrent_sessions(spark, SF_SMOKE).collect()
    ]
    assert got == want and want[0][0] >= 1


def test_profile_approx_survives_pathological_doubles(spark, tmp_path):
    """NaN / ±Inf / decimal-overflow doubles must not crash the approx
    profile (both engines THROW on decimal overflow under ANSI) and
    must collapse to the documented sentinel keys: all NaNs are one
    distinct value, the >=1e23 tail is one value per sign. Null
    counts and numeric min/max stay bit-identical with exact mode."""
    import datetime
    import math
    import os

    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        q61_profile_events,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "a", float("nan"), None),
        (2, t0, 11, "a", float("inf"), "p"),
        (3, t0, 12, "b", float("-inf"), "p"),
        (4, t0, 13, "b", 1e25, "q"),
        (5, t0, 14, "b", 2e25, "q"),
        (6, t0, 15, "c", 1.5, "r"),
        (7, t0, 16, "c", None, "r"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "edge")
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))

    def eq(a, b):
        if a is None or b is None:
            return a is b
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b

    exact = {
        r.col_name: r for r in q61_profile_events(spark, d).collect()
    }
    approx = {
        r.col_name: r
        for r in q61_profile_events(spark, d, approx=True).collect()
    }
    ex, ap = exact["value"], approx["value"]
    assert ex.n_nulls == ap.n_nulls == 1
    assert eq(ap.min_num, ex.min_num) and eq(ap.max_num, ex.max_num)
    # exact: {nan, inf, -inf, 1e25, 2e25, 1.5} = 6; approx sentinel
    # coarsening: {nan, overflow_pos(x3), overflow_neg, 1.500000} = 4
    assert ex.n_distinct == 6
    assert 3 <= ap.n_distinct <= 4


def test_concurrent_sessions_tied_starts(spark, tmp_path):
    """Two sessions starting at the SAME microsecond must both report
    the full concurrency at that instant (the round-4 review's
    confirmed repro: the raw running sum gives the first tied +1 row
    an undercount; the per-instant max window fixes it)."""
    import datetime
    import os

    from data_pipeline_and_visualization_dashboard_spark.queries_ext import (
        q69_concurrent_sessions,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    t1 = t0 + datetime.timedelta(minutes=5)
    rows = [
        (1, t0, 10, "a", 1.0, None),
        (2, t0, 20, "a", 1.0, None),  # tied start, other user
        (3, t1, 10, "a", 1.0, None),
        (4, t1, 20, "a", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path / "tied")
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    got = {
        (r.user_id, r.concurrent)
        for r in q69_concurrent_sessions(spark, d).collect()
    }
    # both sessions contain instant t0 -> concurrency 2 for BOTH rows
    assert got == {(10, 2), (20, 2)}


def test_mmr_rerank_semantics(spark):
    """Beyond the exact differential: the MMR set must MEAN what it
    claims. Rank 1 is the plain relevance argmax; every selected id
    comes from the candidate pool; and the selected set is more
    DIVERSE than the same-size plain top-k by relevance (strictly
    lower mean pairwise cosine — the whole point of the re-rank),
    while paying a bounded relevance cost."""
    import numpy as np

    from data_pipeline_and_visualization_dashboard_spark.extras.similarity import (
        MMR_K, MMR_QUERY, mmr_rerank,
    )
    from data_pipeline_and_visualization_dashboard_spark.io import read_table

    out = mmr_rerank(spark, SF_SMOKE).collect()
    assert [r.rank for r in out] == list(range(1, MMR_K + 1))
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in read_table(
            spark, SF_SMOKE, "embeddings", ["vec_id", "embedding"]
        ).collect()
    }
    qv = emb[MMR_QUERY]
    qv = qv / np.linalg.norm(qv)

    def rel(i):
        v = emb[i] / np.linalg.norm(emb[i])
        return float(v @ qv)

    # rank 1 == plain argmax relevance over the corpus (excl. query)
    best = max((i for i in emb if i != MMR_QUERY), key=lambda i: (rel(i), -i))
    assert out[0].c_id == best

    def mean_pairwise(ids):
        vs = [emb[i] / np.linalg.norm(emb[i]) for i in ids]
        sims = [
            float(vs[i] @ vs[j])
            for i in range(len(vs))
            for j in range(i + 1, len(vs))
        ]
        return sum(sims) / len(sims)

    mmr_ids = [r.c_id for r in out]
    topk_ids = sorted(
        (i for i in emb if i != MMR_QUERY),
        key=lambda i: (-rel(i), i),
    )[:MMR_K]
    if set(mmr_ids) != set(topk_ids):  # re-rank actually changed the set
        assert mean_pairwise(mmr_ids) < mean_pairwise(topk_ids)
    # bounded relevance cost: MMR's mean relevance within 30% of top-k's
    mmr_rel = sum(rel(i) for i in mmr_ids) / MMR_K
    topk_rel = sum(rel(i) for i in topk_ids) / MMR_K
    assert mmr_rel >= 0.7 * topk_rel


@pytest.mark.parametrize("sf", [SF_SMOKE, SF_CORRECT])
def test_containment_est_tracks_exact(spark, sf):
    """The sketch-path containment estimator (signature agreement +
    exact set sizes) must track exact set containment on its own
    candidate pairs: measured max abs error is ≤0.071 at both test
    SFs with 12 hashes; pin a 2x-slack envelope (0.15 max, 0.05 MAE)
    so a broken estimator (wrong algebra, swapped sizes) fails loudly
    while hash-family jitter from a testdata regeneration doesn't."""
    est = dedup.dedup_containment_est(spark, sf)
    sh = dedup.shingle_sets(spark, sf).select(
        "doc_id", F.array_distinct("shingles").alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("sh_b"))
    j = est.join(a, "doc_id_a").join(b, "doc_id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    r = j.select(
        F.max(F.abs(F.col("cont_ab") - inter / F.size("sh_a"))).alias("mx_ab"),
        F.max(F.abs(F.col("cont_ba") - inter / F.size("sh_b"))).alias("mx_ba"),
        F.avg(F.abs(F.col("cont_ab") - inter / F.size("sh_a"))).alias("mae"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert r.n > 0
    assert r.mx_ab <= 0.15 and r.mx_ba <= 0.15
    assert r.mae <= 0.05


def test_ams_f2_estimate_envelope(spark):
    """AMS F2 (median of 16 tug-of-war estimators) must land within a
    documented envelope of exact F2 at SF_CORRECT (measured 0.174;
    pinned at 0.75 — the median-of-16 combine bounds the deviation far
    below a single estimator's ~1.4 relative std). Value equality of
    the whole readout vs DuckDB is the differential test's job; this
    pins that the SKETCH is actually informative, not just
    reproducible."""
    from data_pipeline_and_visualization_dashboard_spark.extras.sketches import (
        ams_f2,
    )

    r = ams_f2(spark, SF_CORRECT).first()
    assert r.f2_exact > 0 and r.ams_est > 0
    assert r.rel_err <= 0.75


def test_corpus_data_card_invariants(spark):
    """corpus_data_card: token shares partition the corpus budget
    (sum == 1 within rounding of the ≤|slices| 6dp-rounded shares),
    doc/token totals equal the raw per-doc sums, dup counts equal the
    cluster-membership counts per slice, and every rate sits in
    [0, 1]."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        cluster_table, corpus_data_card,
    )
    from data_pipeline_and_visualization_dashboard_spark.extras.text import (
        quality_score,
    )

    rows = corpus_data_card(spark, SF_SMOKE).collect()
    assert rows
    assert abs(sum(r.token_share for r in rows) - 1.0) <= 5e-6 * len(rows)
    for r in rows:
        assert 0.0 <= r.kept_frac <= 1.0
        assert 0.0 <= r.dup_rate <= 1.0
        assert 0 <= r.n_dup <= r.n_docs

    q = quality_score(spark, SF_SMOKE, extra_cols=("lang", "source"))
    per_doc = q.select("doc_id", "lang", "source", "token_cnt").collect()
    dup_ids = {r.doc_id for r in cluster_table(spark, SF_SMOKE).collect()}
    want = {}
    for d in per_doc:
        k = (d.source, d.lang)
        n, t, dup = want.get(k, (0, 0, 0))
        want[k] = (n + 1, t + d.token_cnt, dup + (d.doc_id in dup_ids))
    got = {(r.source, r.lang): (r.n_docs, r.n_tokens, r.n_dup) for r in rows}
    assert got == want

def test_release_diff_card_cross_checks_snapshot_diff(spark):
    """corpus_release_diff_card (r16): the slice-grain diff card must
    roll up to dedup_snapshot_diff's per-status doc counts exactly
    (same snapshot stand-ins, same verdict logic — the two operators
    are mutually checkable by construction), its share columns must
    each partition their release's token budget, the drift column
    must sum to ~0 (shares are zero-sum: one slice's gain is the
    others' loss), and per-slice token accounting must cohere:
    tokens_added <= tokens_cur, tokens_removed <= tokens_prev."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        corpus_release_diff_card, dedup_snapshot_diff,
    )

    rows = corpus_release_diff_card(spark, SF_SMOKE).collect()
    assert rows
    sd = {
        r.status: r.n_docs
        for r in dedup_snapshot_diff(spark, SF_SMOKE).collect()
    }
    got = {
        st: sum(r[f"docs_{st}"] for r in rows)
        for st in ("added", "removed", "changed", "unchanged")
    }
    assert got == {st: sd.get(st, 0) for st in got}
    assert abs(sum(r.share_prev for r in rows) - 1.0) <= 5e-6 * len(rows)
    assert abs(sum(r.share_cur for r in rows) - 1.0) <= 5e-6 * len(rows)
    assert abs(sum(r.share_drift for r in rows)) <= 5e-6 * len(rows)
    for r in rows:
        assert 0 <= r.tokens_added <= r.tokens_cur
        assert 0 <= r.tokens_removed <= r.tokens_prev
        assert r.docs_added + r.docs_removed + r.docs_changed + \
            r.docs_unchanged > 0

def test_shard_diff_localizes_rewrites(spark):
    """corpus_shard_diff (r16): the incremental-publish claim, checked
    against ground truth — recompute each release's shard membership
    doc-by-doc in Python and verify (a) needs_rewrite is TRUE for
    exactly the shards containing an added/removed/changed doc and
    FALSE elsewhere (content-hash assignment localizes rewrites —
    unchanged docs never migrate shards), (b) doc/token deltas roll up
    to the release-wide totals the slice-grain diff card reports, and
    (c) equal checksums ⟺ identical shard content sets."""
    from data_pipeline_and_visualization_dashboard_spark.extras.dedup import (
        corpus_release_diff_card, corpus_shard_diff,
    )

    rows = {r.shard: r for r in corpus_shard_diff(spark, SF_SMOKE).collect()}
    assert rows

    # ground truth from the raw docs (pure Python, no Spark machinery)
    import hashlib as _hl

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(
            SF_SMOKE + "/documents.parquet"
        ).select("doc_id", "text").collect()
        if r.text is not None
    }

    def h60(s: str) -> int:
        return int(_hl.md5(s.encode()).hexdigest()[:15], 16)

    def shard_of(doc_id: int) -> int:
        return h60(f"shard{doc_id}") % 16

    prev = {d: t for d, t in docs.items() if d % 10 != 0}
    cur = {
        d: (t + " rev2" if d % 7 == 0 else t)
        for d, t in docs.items()
        if d % 13 != 0
    }
    dirty = set()
    for d in set(prev) | set(cur):
        if prev.get(d) != cur.get(d):  # added, removed, or revised
            dirty.add(shard_of(d))
    for s, r in rows.items():
        assert r.needs_rewrite == (s in dirty), (s, r)
        assert r.docs_delta == r.n_docs_cur - r.n_docs_prev
        assert r.tokens_delta == r.n_tokens_cur - r.n_tokens_prev
        # checksum equality ⟺ identical content set for the shard
        pset = {(d, prev[d]) for d in prev if shard_of(d) == s}
        cset = {(d, cur[d]) for d in cur if shard_of(d) == s}
        assert (r.checksum_prev == r.checksum_cur) == (pset == cset)

    # shard rollup == the slice-grain diff card's release totals
    card = corpus_release_diff_card(spark, SF_SMOKE).collect()
    assert sum(r.n_tokens_prev for r in rows.values()) == sum(
        c.tokens_prev for c in card
    )
    assert sum(r.n_tokens_cur for r in rows.values()) == sum(
        c.tokens_cur for c in card
    )
    assert sum(r.n_docs_cur - r.n_docs_prev for r in rows.values()) == sum(
        c.docs_added - c.docs_removed for c in card
    )
