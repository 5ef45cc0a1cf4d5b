"""Training-data pipeline operators vs pandas/duckdb oracles (sf0.001)."""

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from project_gutenberg_full_text_search_spark.functions.hashing import (
    md5_long_py,
    minhash_hash_py,
)
from project_gutenberg_full_text_search_spark.functions.text import tokenize_str
from project_gutenberg_full_text_search_spark.operators import (
    dedup,
    ivf,
    multimodal,
    similarity,
    textstats,
)


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pdf(documents):
    return documents.toPandas()


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def emb_pdf(embeddings):
    return embeddings.toPandas()


# ---- hashing cross-engine ----

def test_md5_long_col_matches_python(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"s": ["a", "hello world", ""]}))
    from project_gutenberg_full_text_search_spark.functions.hashing import md5_long_col

    got = [r[0] for r in df.select(md5_long_col("s")).collect()]
    assert got == [md5_long_py(s) for s in ["a", "hello world", ""]]


def test_md5_long_matches_duckdb():
    import duckdb

    from project_gutenberg_full_text_search_spark.functions.hashing import md5_long_sql

    expr = md5_long_sql("'hello'")
    got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    assert got == md5_long_py("hello")


# ---- exact dedup ----

def test_exact_dedup(spark, documents, docs_pdf):
    g = dedup.exact_dedup_groups(documents, "text").toPandas()
    exp = docs_pdf.groupby(docs_pdf.text.map(lambda t: hashlib.md5(t.encode()).hexdigest()))
    assert len(g) == exp.ngroups
    assert g["n"].sum() == len(docs_pdf)
    deduped = dedup.exact_dedup(documents, "text")
    assert deduped.count() == exp.ngroups


# ---- shingles + minhash ----

def _py_shingles(text, n=3):
    toks = tokenize_str(text)
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def test_shingles_expr(spark, documents, docs_pdf):
    got = documents.select("doc_id", dedup.shingles_expr("text").alias("sh")).toPandas()
    row = got[got.doc_id == 0].iloc[0]
    assert list(row.sh) == _py_shingles(docs_pdf[docs_pdf.doc_id == 0].text.iloc[0])


def test_minhash_signature_matches_python(documents, docs_pdf):
    sigs = dedup.minhash_signatures(documents, "text", k=8).toPandas()
    row = sigs[sigs.doc_id == 1].iloc[0]
    sh = _py_shingles(docs_pdf[docs_pdf.doc_id == 1].text.iloc[0])
    exp = [min(minhash_hash_py(x, s) for x in sh) for s in range(8)]
    assert list(row.sig) == exp


def test_minhash_lane_hash_matches_duckdb():
    import duckdb

    from project_gutenberg_full_text_search_spark.functions.hashing import (
        minhash_hash_sql,
    )

    for s in (0, 3, 15):
        frag = minhash_hash_sql("'foo bar'", s)
        got = duckdb.sql(f"SELECT {frag}").fetchone()[0]
        assert got == minhash_hash_py("foo bar", s), s


def test_ngram_jaccard_pairs_exact_no_cartesian(spark, documents, docs_pdf):
    pairs = dedup.ngram_jaccard_pairs(documents, "text", threshold=0.2)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in pairs.collect()
    }
    # brute-force twin over the full (small) corpus
    sh = {r.doc_id: set(_py_shingles(r.text)) for r in docs_pdf.itertuples(index=False)}
    exp = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            u = sh[a] | sh[b]
            if not u:
                continue
            j = round(len(sh[a] & sh[b]) / len(u), 4)
            if j >= 0.2:
                exp[(a, b)] = j
    assert got == pytest.approx(exp)


def test_ngram_jaccard_stop_shingle_cap(spark):
    """With max_shingle_df set, a planted corpus-wide hot shingle is
    excluded from candidate generation, but every pair sharing ≥1 sub-cap
    shingle keeps its EXACT (uncapped) jaccard; candidate volume is
    bounded by the sub-cap inverted join."""
    import pandas as pd

    # 30 docs: all share the boilerplate "lic lic lic" shingle run; docs
    # 2i/2i+1 additionally share a pair-unique payload (sub-cap shingles)
    rows = []
    for i in range(30):
        payload = f"pay{i // 2} load{i // 2} only{i // 2} x{i}"
        rows.append((i, "lic lic lic lic " + payload))
    docs = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(docs, "text", threshold=0.01).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(
            docs, "text", threshold=0.01, max_shingle_df=5
        ).collect()
    }
    # every capped pair reports the exact uncapped jaccard
    for pair, j in capped.items():
        assert uncapped[pair] == j, pair
    # the payload-sharing pairs all survive (they share sub-cap shingles)
    for i in range(15):
        assert (2 * i, 2 * i + 1) in capped
    # pairs dropped by the cap shared ONLY the hot boilerplate shingles
    sh = {
        r.doc_id: set(r.sh)
        for r in docs.select(
            "doc_id", dedup.shingles_expr("text").alias("sh")
        ).collect()
    }
    hot = {g for g in set().union(*sh.values())
           if sum(g in s for s in sh.values()) > 5}
    for pair in set(uncapped) - set(capped):
        assert sh[pair[0]] & sh[pair[1]] <= hot, pair
    # candidate volume bounded: uncapped enumerates all C(30,2) overlapping
    # pairs; capped only the payload pairs
    assert len(uncapped) == 30 * 29 // 2
    assert len(capped) == 15


def test_minhash_dedup_finds_planted_dups(spark, documents):
    # plant near-duplicates: doc + itself with one token changed
    base = documents.limit(20)
    mutated = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzextra")).alias("text"),
    )
    both = base.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.minhash_dedup_pairs(both, "text", k=16, bands=4, rows=4, threshold=0.5).toPandas()
    found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    planted = {(i, i + 100000) for i in range(20)}
    # LSH is probabilistic but near-identical docs (J≈0.99) share bands w.h.p.
    assert len(found & planted) >= 18
    assert (pairs.jaccard >= 0.5).all()


def test_simhash_matches_python(documents, docs_pdf):
    got = dedup.simhash(documents.limit(5), "text", bits=16).toPandas()
    for r in got.itertuples(index=False):
        text = docs_pdf[docs_pdf.doc_id == r.doc_id].text.iloc[0]
        tf = Counter(tokenize_str(text))
        exp = 0
        for i in range(16):
            w = sum(
                c * (2 * ((md5_long_py(t) >> i) & 1) - 1) for t, c in tf.items()
            )
            if w > 0:
                exp |= 1 << i
        assert r.simhash == exp, r.doc_id


def test_simhash_neardups_have_small_hamming(spark, documents):
    base = documents.limit(10)
    mutated = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    both = base.select("doc_id", "text").unionByName(mutated)
    sh = dedup.simhash(both, "text", bits=16).toPandas()
    m = dict(zip(sh.doc_id, sh.simhash))
    for i in range(10):
        assert bin(m[i] ^ m[i + 100000]).count("1") <= 4


# ---- ANN ----

def test_cosine_topk_matches_numpy(embeddings, emb_pdf):
    q = list(emb_pdf[emb_pdf.vec_id == 0].embedding.iloc[0])
    got = similarity.cosine_topk(embeddings, q, k=10).toPandas()
    M = np.stack(emb_pdf.embedding.to_numpy())
    qv = np.asarray(q)
    cos = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = sorted(zip(emb_pdf.vec_id, np.round(cos, 4)), key=lambda t: (-t[1], t[0]))
    assert got.vec_id.tolist() == [i for i, _ in order[:10]]
    assert got.cos.tolist() == pytest.approx([c for _, c in order[:10]], abs=2e-4)


def test_lsh_topk_subset_of_bucket(embeddings, emb_pdf):
    q = list(emb_pdf[emb_pdf.vec_id == 3].embedding.iloc[0])
    got = similarity.ann_lsh_topk(embeddings, q, k=5).toPandas()
    assert 3 in got.vec_id.tolist()  # the query's own vector is in its bucket
    assert got.cos.iloc[0] == 1.0


def test_embedding_neardup_pairs(spark, embeddings):
    dup = embeddings.limit(5).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    both = embeddings.unionByName(dup)
    pairs = similarity.embedding_neardup_pairs(both, threshold=0.999, dim=64).toPandas()
    found = {(a, b) for a, b in zip(pairs.id_a, pairs.id_b)}
    assert {(i, i + 1000) for i in range(5)} <= found


# ---- text stats ----

def test_text_profile_matches_python(documents, docs_pdf):
    got = textstats.text_profile(documents.limit(20), "text").toPandas()
    for r in got.itertuples(index=False):
        text = docs_pdf[docs_pdf.doc_id == r.doc_id].text.iloc[0]
        toks = tokenize_str(text)
        assert r.ident_tokens == len(toks)
        assert r.ws_tokens == len([w for w in re.split(r"\s+", text) if w])
        stop = sum(1 for t in toks if t in textstats.EN_STOPWORDS)
        assert r.stopword_ratio == pytest.approx(round(stop / max(len(toks), 1), 4))
        dt = sorted(set(toks))
        assert r.fingerprint == hashlib.md5(" ".join(dt).encode()).hexdigest()
        # langid deterministic + argmax
        scores = {
            lang: len(set(ms) & set(toks))
            for lang, ms in textstats.LANG_MARKERS.items()
        }
        exp_lang = min(
            (lang for lang in scores if scores[lang] == max(scores.values())),
        ) if max(scores.values()) > -1 else "unknown"
        assert r.lang_pred == exp_lang


# ---- multimodal plumbing ----

def test_multimodal_features(spark):
    media = multimodal.synthesize_media(spark, 30)
    feats = multimodal.extract_features(media, fake=True).toPandas()
    assert len(feats) == 30
    assert all(len(f) == multimodal.FEATURE_DIM for f in feats.features)
    # determinism: same payload → same features
    again = multimodal.extract_features(media, fake=True).toPandas()
    f0 = feats.sort_values("media_id").features.tolist()
    f1 = again.sort_values("media_id").features.tolist()
    assert all(list(a) == list(b) for a, b in zip(f0, f1))


def test_multimodal_decode_stub_raises(spark):
    media = multimodal.synthesize_media(spark, 2)
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        multimodal.extract_features(media, fake=False).collect()


def test_real_decoder_seam_used_when_present(spark, monkeypatch):
    """Injecting a 'real' decoder at the auto-detect seam is enough for
    fake=False to use it — resolution is driver-side so the patched
    callable rides the mapInPandas closure to the workers."""
    marker = [float(i) + 0.5 for i in range(multimodal.FEATURE_DIM)]
    monkeypatch.setitem(
        multimodal._REAL_DECODERS, "image", lambda payload: marker
    )
    monkeypatch.setitem(multimodal._REAL_DECODERS, "audio", lambda p: marker)
    monkeypatch.setitem(multimodal._REAL_DECODERS, "video", lambda p: marker)
    media = multimodal.synthesize_media(spark, 6)
    feats = multimodal.extract_features(media, fake=False).toPandas()
    assert len(feats) == 6
    assert all(list(f) == marker for f in feats.features)


def test_real_decoder_seam_frames_and_resize(spark, monkeypatch):
    monkeypatch.setitem(
        multimodal._REAL_DECODERS,
        "video_frames",
        lambda payload, n: [b"frame%d" % j for j in range(n)],
    )
    monkeypatch.setitem(multimodal._REAL_DECODERS, "image", None)
    media = multimodal.synthesize_media(spark, 6)
    frames = multimodal.sample_frames(media, n_frames=3, fake=False).toPandas()
    vids = media.filter("media_type = 'video'").count()
    assert len(frames) == vids * 3
    assert set(bytes(p) for p in frames.frame_payload) == {
        b"frame0", b"frame1", b"frame2"
    }
    # feature decoder absent → deterministic fake features of the frames
    assert all(len(f) == multimodal.FEATURE_DIM for f in frames.features)

    monkeypatch.setitem(
        multimodal._REAL_DECODERS,
        "image_resize",
        lambda payload, w, h: b"resized:%dx%d" % (w, h),
    )
    out = multimodal.resize_images(media, 32, 16, fake=False).toPandas()
    imgs = out[out.media_type == "image"]
    assert all(bytes(p) == b"resized:32x16" for p in imgs.payload)
    others = out[out.media_type != "image"]
    orig = media.toPandas().set_index("media_id")
    assert all(
        bytes(p) == bytes(orig.loc[m, "payload"])
        for m, p in zip(others.media_id, others.payload)
    )


def test_probe_caches_absent_decoders():
    multimodal._REAL_DECODERS.pop("audio", None)
    assert multimodal._probe_real_decoder("audio") is None  # no librosa here
    assert "audio" in multimodal._REAL_DECODERS  # probed once, cached


def test_media_stats(spark):
    media = multimodal.synthesize_media(spark, 30)
    st = multimodal.media_stats(media).toPandas()
    assert st.media_type.tolist() == ["audio", "image", "video"]
    assert st.n.sum() == 30


def test_hyperplane_bucket_cross_engine(emb_pdf):
    """Spark, DuckDB, and Python bucket expressions are bit-identical."""
    import duckdb

    planes = similarity.hyperplane_matrix(64, nbits=16, seed=42)
    con = duckdb.connect()
    con.register("e", emb_pdf[["vec_id", "embedding"]])
    frag = similarity.hyperplane_bucket_sql("embedding", planes)
    duck = dict(
        con.execute(f"SELECT vec_id, {frag} AS b FROM e ORDER BY vec_id").fetchall()
    )
    for r in emb_pdf.head(50).itertuples(index=False):
        assert similarity.hyperplane_bucket_py(list(r.embedding), planes) == duck[r.vec_id]


def test_hyperplane_bucket_spark_matches_python(embeddings, emb_pdf):
    from pyspark.sql import functions as F

    planes = similarity.hyperplane_matrix(64, nbits=16, seed=42)
    got = dict(
        embeddings.select(
            "vec_id",
            similarity.hyperplane_bucket_col(F.col("embedding"), planes).alias("b"),
        ).collect()
    )
    for r in emb_pdf.head(50).itertuples(index=False):
        assert got[r.vec_id] == similarity.hyperplane_bucket_py(list(r.embedding), planes)


def test_ann_lsh_recall_at_10(spark):
    """Multi-probe hyperplane LSH recall@10 ≥ 0.9 vs exact cosine top-k on
    a clustered corpus (10 planted near-neighbors of the query)."""
    import pandas as pd

    rng = np.random.RandomState(7)
    base = rng.standard_normal((1000, 32)).astype(np.float32)
    q = base[0]
    planted = q[None, :] + 0.1 * rng.standard_normal((10, 32)).astype(np.float32)
    M = np.vstack([base, planted])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(M)), "embedding": [row.tolist() for row in M]}
    )
    emb = spark.createDataFrame(pdf)
    exact = similarity.cosine_topk(emb, q.tolist(), k=10).toPandas()
    approx = similarity.ann_lsh_topk(emb, q.tolist(), k=10).toPandas()
    recall = len(set(exact.vec_id) & set(approx.vec_id)) / 10
    assert recall >= 0.9, recall


def _clustered_emb(spark, dim, n=400, planted=10, seed=7):
    import pandas as pd

    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    q = base[0]
    near = q[None, :] + 0.1 * rng.standard_normal((planted, dim)).astype(np.float32)
    M = np.vstack([base, near])
    pdf = pd.DataFrame(
        {"vec_id": np.arange(len(M)), "embedding": [row.tolist() for row in M]}
    )
    return spark.createDataFrame(pdf), q


def test_hyperplane_bucket_highdim_uses_mapinpandas(spark):
    """At production dims (1536) the bucket computation must be ONE numpy
    matmul in mapInPandas, not a 24k-node Catalyst expression that falls
    out of whole-stage codegen into interpreted per-row eval."""
    emb, q = _clustered_emb(spark, dim=1536, n=300)
    planes = similarity.hyperplane_matrix(1536, nbits=16, seed=42)
    bucketed = similarity.with_hyperplane_bucket(emb, "embedding", planes)
    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan[:500]
    # and the engine routes ann_lsh_topk through it at this dim
    approx_plan = (
        similarity.ann_lsh_topk(emb, q.tolist(), k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in approx_plan
    exact = similarity.cosine_topk(emb, q.tolist(), k=10).toPandas()
    approx = similarity.ann_lsh_topk(emb, q.tolist(), k=10).toPandas()
    recall = len(set(exact.vec_id) & set(approx.vec_id)) / 10
    assert recall >= 0.9, recall


def test_hyperplane_bucket_pandas_matches_expr_lowdim(spark, embeddings):
    """On a comfortable margin away from zero the matmul path and the
    chained-sum expression path agree (dot-order only matters within float
    rounding of zero)."""
    planes = similarity.hyperplane_matrix(64, nbits=8, seed=42)
    via_expr = dict(
        similarity.with_hyperplane_bucket(
            embeddings, "embedding", planes, method="expr"
        ).select("vec_id", "_bucket").collect()
    )
    via_pd = dict(
        similarity.with_hyperplane_bucket(
            embeddings, "embedding", planes, method="pandas"
        ).select("vec_id", "_bucket").collect()
    )
    agree = sum(via_expr[k] == via_pd[k] for k in via_expr)
    assert agree >= 0.99 * len(via_expr)


def test_persisted_ann_index_partition_pruned(spark, tmp_path):
    """write_ann_index → ann_index_topk must scan ONLY the multi-probe
    bucket partitions (checked via input_file_name of the probed scan)."""
    emb, q = _clustered_emb(spark, dim=32, n=500)
    path = str(tmp_path / "ann_idx")
    meta = similarity.write_ann_index(emb, path, dim=32, nbits=8, seed=42)
    assert meta["nbits"] == 8
    planes = similarity.hyperplane_matrix(32, 8, 42)
    qb = similarity.hyperplane_bucket_py(q.tolist(), planes)
    probes = set(similarity.probe_buckets(qb, 8, similarity.DEFAULT_PROBE_HAMMING))

    df, m = similarity.read_ann_index(spark, path)
    probed = df.filter(F.col("bucket").isin(list(probes)))
    files = [
        r[0] for r in probed.select(F.input_file_name()).distinct().collect()
    ]
    assert files, "probe read no files"
    for fpath in files:
        mm = re.search(r"bucket=(\d+)", fpath)
        assert mm and int(mm.group(1)) in probes, fpath
    # and the end-to-end probe returns the planted neighborhood
    topk = similarity.ann_index_topk(spark, path, q.tolist(), k=10).toPandas()
    exact = similarity.cosine_topk(emb, q.tolist(), k=10).toPandas()
    recall = len(set(exact.vec_id) & set(topk.vec_id)) / 10
    assert recall >= 0.9, recall


def test_ann_index_default_nbits_caps_dirs(spark, tmp_path):
    """The persisted-index default is 12 bits → ≤4,096 partition dirs
    (object-store friendly; the transient query-path default stays 16)."""
    import os

    emb, q = _clustered_emb(spark, dim=32, n=300)
    path = str(tmp_path / "ann_default")
    meta = similarity.write_ann_index(emb, path, dim=32, seed=42)
    assert similarity.DEFAULT_INDEX_NBITS == 12
    assert meta["nbits"] == similarity.DEFAULT_INDEX_NBITS
    dirs = [d for d in os.listdir(path) if d.startswith("bucket=")]
    assert 0 < len(dirs) <= 2**similarity.DEFAULT_INDEX_NBITS
    topk = similarity.ann_index_topk(spark, path, q.tolist(), k=5).toPandas()
    assert len(topk) == 5 and topk.cos.iloc[0] == 1.0  # query's own vector


def test_write_ann_index_rejects_wrong_dim(spark, tmp_path):
    """A vector whose length != declared dim must fail LOUDLY at write
    time on both bucketing paths — silently null-bucketed rows would be
    invisible to multi-probe reads (recall loss with no error)."""
    emb, _ = _clustered_emb(spark, dim=32, n=40)
    with pytest.raises(Exception, match="dim"):
        similarity.write_ann_index(
            emb, str(tmp_path / "bad_expr"), dim=48, nbits=8, method="expr"
        )
    with pytest.raises(Exception, match="dim"):
        similarity.write_ann_index(
            emb, str(tmp_path / "bad_pd"), dim=48, nbits=8, method="pandas"
        )


# ---- IVF ANN (the second scale path: trained Voronoi cells) ----

def test_ivf_seeded_centroids_deterministic_unit():
    a = ivf.seeded_centroids(64, 16, 42)
    b = ivf.seeded_centroids(64, 16, 42)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)
    assert not np.array_equal(a, ivf.seeded_centroids(64, 16, 43))


def test_ivf_cell_cross_engine(emb_pdf):
    """DuckDB's generated cell-assignment SELECT must match the pure-Python
    twin bit-for-bit (chained-sum dots, lowest-index tie-break)."""
    import duckdb

    C = ivf.seeded_centroids(64, 16, 42)
    con = duckdb.connect()
    con.register("embeddings", emb_pdf)
    sql = ivf.ivf_cell_select_sql("embeddings", "vec_id", "embedding", C)
    duck = {vid: cell for vid, _v, cell in con.execute(sql).fetchall()}
    for r in emb_pdf.itertuples(index=False):
        assert duck[r.vec_id] == ivf.ivf_cell_py(list(r.embedding), C)


def test_ivf_cell_spark_expr_matches_python(embeddings, emb_pdf):
    C = ivf.seeded_centroids(64, 16, 42)
    got = dict(
        ivf.with_ivf_cell(embeddings, "embedding", C, "c", method="expr")
        .select("vec_id", "c")
        .collect()
    )
    for r in emb_pdf.itertuples(index=False):
        assert got[r.vec_id] == ivf.ivf_cell_py(list(r.embedding), C)


def test_ivf_cell_pandas_matches_expr(embeddings):
    """Matmul-argmax and fold-expression assignment agree away from ties
    (numpy argmax and array_position both break ties to the lowest cell)."""
    C = ivf.seeded_centroids(64, 16, 42)
    via_expr = dict(
        ivf.with_ivf_cell(embeddings, "embedding", C, "c", method="expr")
        .select("vec_id", "c")
        .collect()
    )
    via_pd = dict(
        ivf.with_ivf_cell(embeddings, "embedding", C, "c", method="pandas")
        .select("vec_id", "c")
        .collect()
    )
    agree = sum(via_expr[k] == via_pd[k] for k in via_expr)
    assert agree >= 0.99 * len(via_expr)


def test_ivf_full_probe_is_exact(embeddings, emb_pdf):
    """nprobe == nlist must return EXACTLY cosine_topk — the cell plumbing
    adds no approximation of its own (no lost or duplicated rows)."""
    q = [float(x) for x in emb_pdf[emb_pdf.vec_id == 0].embedding.iloc[0]]
    exact = similarity.cosine_topk(embeddings, q, k=10).collect()
    full = ivf.ann_ivf_topk(embeddings, q, k=10, nlist=16, nprobe=16).collect()
    assert [(r.vec_id, r.cos) for r in exact] == [(r.vec_id, r.cos) for r in full]


def test_ivf_trained_centroids_deterministic_and_recall(spark):
    """Training is a pure function of (input, args) — two runs agree
    bit-for-bit — and on a clustered corpus a 4-of-16 probe keeps
    recall@10 ≥ 0.9 vs exact cosine."""
    emb, q = _clustered_emb(spark, dim=32, n=500)
    C1 = ivf.train_centroids(emb, dim=32, nlist=16, seed=11)
    C2 = ivf.train_centroids(emb, dim=32, nlist=16, seed=11)
    assert np.array_equal(C1, C2)
    assert C1.shape == (16, 32)
    assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)
    exact = similarity.cosine_topk(emb, q.tolist(), k=10).toPandas()
    approx = ivf.ann_ivf_topk(
        emb, q.tolist(), k=10, centroids=C1, nprobe=4
    ).toPandas()
    recall = len(set(exact.vec_id) & set(approx.vec_id)) / 10
    assert recall >= 0.9, recall


def test_ivf_highdim_uses_mapinpandas(spark):
    """At production dims the assignment must be ONE numpy matmul-argmax in
    mapInPandas, not a Catalyst tree past the codegen budget."""
    emb, q = _clustered_emb(spark, dim=1536, n=300)
    C = ivf.seeded_centroids(1536, 64, 42)
    celled = ivf.with_ivf_cell(emb, "embedding", C)
    assert "MapInPandas" in celled._jdf.queryExecution().executedPlan().toString()
    exact = similarity.cosine_topk(emb, q.tolist(), k=10).toPandas()
    approx = ivf.ann_ivf_topk(
        emb, q.tolist(), k=10, centroids=C, nprobe=16
    ).toPandas()
    recall = len(set(exact.vec_id) & set(approx.vec_id)) / 10
    assert recall >= 0.9, recall


def test_persisted_ivf_index_partition_pruned(spark, tmp_path):
    """write_ivf_index → ann_ivf_index_topk must scan ONLY the nprobe
    probed cell partitions (checked via input_file_name of the probed
    scan), and the centroid matrix must round-trip through the metadata."""
    emb, q = _clustered_emb(spark, dim=32, n=500)
    C = ivf.train_centroids(emb, dim=32, nlist=16, seed=11)
    path = str(tmp_path / "ivf_idx")
    meta = ivf.write_ivf_index(emb, path, dim=32, centroids=C)
    assert np.array_equal(np.asarray(meta["centroids"]), C)
    df, m = ivf.read_ivf_index(spark, path)
    assert np.array_equal(np.asarray(m["centroids"]), C)

    probes = set(ivf.query_probe_cells(q.tolist(), C, 4))
    probed = df.filter(F.col("cell").isin(list(probes)))
    files = [r[0] for r in probed.select(F.input_file_name()).distinct().collect()]
    assert files, "probe read no files"
    for fpath in files:
        mm = re.search(r"cell=(\d+)", fpath)
        assert mm and int(mm.group(1)) in probes, fpath

    topk = ivf.ann_ivf_index_topk(spark, path, q.tolist(), k=10, nprobe=4).toPandas()
    exact = similarity.cosine_topk(emb, q.tolist(), k=10).toPandas()
    recall = len(set(exact.vec_id) & set(topk.vec_id)) / 10
    assert recall >= 0.9, recall


def test_ivf_dim_validation(spark, tmp_path):
    """Wrong-length vectors fail LOUDLY on both assignment paths, and a
    wrong-dim query is rejected before any scan."""
    emb, q = _clustered_emb(spark, dim=32, n=40)
    with pytest.raises(Exception, match="dim"):
        ivf.write_ivf_index(emb, str(tmp_path / "bad_expr"), dim=48, nlist=8, method="expr")
    with pytest.raises(Exception, match="dim"):
        ivf.write_ivf_index(emb, str(tmp_path / "bad_pd"), dim=48, nlist=8, method="pandas")
    path = str(tmp_path / "ok")
    ivf.write_ivf_index(emb, path, dim=32, nlist=8)
    with pytest.raises(ValueError, match="dim"):
        ivf.ann_ivf_index_topk(spark, path, [0.0] * 48, k=5)


# ---- scrubbing / clustering / sampling (training-data pipeline ops) ----

def test_scrub_text_redacts_known_pii(spark):
    from project_gutenberg_full_text_search_spark.operators import scrub

    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "contact me at alice.smith+dev@example.co.uk today",
                "see https://example.com/a?b=c&d=e and http://x.io/p",
                "server at 192.168.1.254 responded; also 10.0.0.1.",
                "clean text with no pii at all",
            ],
        }
    )
    got = (
        scrub.scrub_text(spark.createDataFrame(rows))
        .orderBy("doc_id")
        .toPandas()
    )
    assert got.clean.tolist() == [
        "contact me at <EMAIL> today",
        "see <URL> and <URL>",
        "server at <IP> responded; also <IP>.",
        "clean text with no pii at all",
    ]
    assert got.n_email.tolist() == [1, 0, 0, 0]
    assert got.n_url.tolist() == [0, 2, 0, 0]
    assert got.n_ipv4.tolist() == [0, 0, 2, 0]


def test_scrub_sql_twin_matches(spark):
    """The DuckDB twin must produce byte-identical redactions."""
    import duckdb
    import pandas as pd

    from project_gutenberg_full_text_search_spark.operators import scrub

    rows = pd.DataFrame(
        {
            "doc_id": list(range(5)),
            "text": [
                "a@b.io and https://u:pw@host/path plus 8.8.8.8",
                "nested url http://e.com/x@y.z trailing",
                "999.1.1.1 borderline 1.2.3.4.5 and x@y",
                "",
                "multi a@b.cd c@d.ef https://q.r 1.1.1.1",
            ],
        }
    )
    got = (
        scrub.scrub_text(spark.createDataFrame(rows))
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", rows)
    exp = con.execute(
        f"SELECT doc_id, {scrub.scrub_sql('text')} AS clean, "
        + ", ".join(scrub.scrub_count_sql("text"))
        + " FROM t ORDER BY doc_id"
    ).df()
    assert got.clean.tolist() == exp.clean.tolist()
    for c in ("n_url", "n_email", "n_ipv4"):
        assert got[c].tolist() == exp[c].tolist(), c


def test_neardup_clusters_components(spark):
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                # component {1,2,3,4} as a CHAIN (forces multi-round
                # propagation), component {10,11}, component {20,21,22}
                # as a triangle
                "id_a": [1, 2, 3, 10, 20, 20, 21],
                "id_b": [2, 3, 4, 11, 21, 22, 22],
            }
        )
    )
    got = dedup.neardup_clusters(pairs).toPandas().sort_values("doc_id")
    assert dict(zip(got.doc_id, got.cluster)) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20,
    }


def test_neardup_clusters_high_diameter_path_graph(spark):
    """A 50-node path graph (diameter 49 — far beyond the old 20-round
    default) must still converge: the default runs to convergence with
    periodic localCheckpoint lineage truncation (VERDICT r4 #2)."""
    import pandas as pd

    n = 50
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": list(range(n - 1)), "id_b": list(range(1, n))})
    )
    got = dedup.neardup_clusters(pairs).toPandas()
    assert len(got) == n
    assert set(got.cluster) == {0}  # every node reaches the minimum label


def test_neardup_clusters_bounded_run_raises_when_unconverged(spark):
    """An explicit max_iter that exits still-changing must FAIL LOUDLY —
    silently-unconverged labels would let canonical_docs keep several
    survivors from one duplicate group (ADVICE r4)."""
    import pandas as pd

    n = 12
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": list(range(n - 1)), "id_b": list(range(1, n))})
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.neardup_clusters(pairs, max_iter=2)


def test_canonical_docs_keeps_one_per_cluster(spark):
    import pandas as pd

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(8))})
    )
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [1, 2, 5], "id_b": [2, 3, 6]})
    )
    clusters = dedup.neardup_clusters(pairs)
    kept = sorted(
        r.doc_id for r in dedup.canonical_docs(docs, clusters).collect()
    )
    # {1,2,3} -> keep 1; {5,6} -> keep 5; singletons 0,4,7 survive
    assert kept == [0, 1, 4, 5, 7]


def test_hash_sample_deterministic_and_cross_engine(spark, documents, docs_pdf):
    import duckdb

    from project_gutenberg_full_text_search_spark.operators.etl import (
        hash_sample,
        hash_sample_sql,
    )

    a = sorted(r.doc_id for r in hash_sample(documents, 0.2, seed=7).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(documents.repartition(13), 0.2, seed=7)
        .select("doc_id")
        .collect()
    )
    assert a == b and 0 < len(a) < len(docs_pdf)  # stable under repartition
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    exp = con.execute(
        f"SELECT doc_id FROM documents WHERE {hash_sample_sql('doc_id', 0.2, 7)} ORDER BY doc_id"
    ).df()
    assert a == exp.doc_id.tolist()
    # different seed → different sample
    c = sorted(r.doc_id for r in hash_sample(documents, 0.2, seed=8).select("doc_id").collect())
    assert c != a


def test_sample_frames_expands_videos(spark):
    media = multimodal.synthesize_media(spark, 30, seed=9)
    frames = multimodal.sample_frames(media, n_frames=4).toPandas()
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert len(frames) == 4 * n_videos
    # per-video: frame indices 0..3, deterministic distinct payloads
    g = frames.groupby("media_id")
    for mid, grp in g:
        assert sorted(grp.frame_idx.tolist()) == [0, 1, 2, 3]
        assert len({bytes(p) for p in grp.frame_payload}) == 4
    # deterministic across runs
    again = multimodal.sample_frames(media, n_frames=4).toPandas()
    a = sorted(zip(frames.media_id, frames.frame_idx, map(bytes, frames.frame_payload)))
    b = sorted(zip(again.media_id, again.frame_idx, map(bytes, again.frame_payload)))
    assert a == b
    # honest stub: real decode path raises
    with pytest.raises(Exception, match="ffmpeg"):
        multimodal.sample_frames(media, n_frames=2, fake=False).collect()


def test_resize_images_updates_meta_only_for_images(spark):
    media = multimodal.synthesize_media(spark, 30, seed=9)
    out = multimodal.resize_images(media, 224, 224).toPandas()
    src = media.toPandas()
    assert len(out) == len(src)
    for r, s in zip(
        out.sort_values("media_id").itertuples(),
        src.sort_values("media_id").itertuples(),
    ):
        if r.media_type == "image":
            assert r.meta["width"] == "224" and r.meta["height"] == "224"
            assert bytes(r.payload) != bytes(s.payload)
            assert len(r.payload) == min(224 * 224 * 3, 4096)
        else:  # non-images pass through untouched
            assert bytes(r.payload) == bytes(s.payload)
            assert r.meta == s.meta
    with pytest.raises(Exception, match="PIL"):
        multimodal.resize_images(media, 64, 64, fake=False).collect()


def test_scrub_patterns_portable_property():
    """Hypothesis fuzz: the scrub rules produce IDENTICAL redactions in
    Python re and DuckDB RE2 over adversarial ASCII text (boundary
    digits, partial emails, scheme fragments, dotted runs). The Spark
    (Java regex) side is pinned to DuckDB by the batch test above; this
    property closes the triangle cheaply at hundreds of examples."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from project_gutenberg_full_text_search_spark.operators import scrub

    con = duckdb.connect()
    frag = st.sampled_from(
        [
            "a@b.io", "x@", "@y.com", "http://", "https://e.com/p?q=1",
            "1.2.3.4", "999.999.1.1", "1.2.3.4.5", ".", "..", "@",
            " ", "\t", "\n", "word", "a1b2", "%+-", "e.co.uk", ":",
        ]
    )
    text_strategy = st.lists(
        st.one_of(frag, st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=8)),
        max_size=12,
    ).map("".join)

    @settings(max_examples=200, deadline=None)
    @given(text_strategy)
    def check(text):
        exp = con.execute(
            f"SELECT {scrub.scrub_sql('t')} AS c FROM (SELECT ? AS t)", [text]
        ).fetchone()[0]
        assert scrub.scrub_py(text) == exp, repr(text)

    check()


# ---- stratified sampling ----


def test_stratified_sample_matches_per_row_hash(spark, documents, docs_pdf):
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_py,
    )
    from project_gutenberg_full_text_search_spark.operators.etl import (
        stratified_sample,
    )

    fracs = {"en": 0.05, "zh": 0.4}
    got = {
        r.doc_id
        for r in stratified_sample(
            documents, "lang", fracs, default=0.2, seed=11
        ).collect()
    }
    exp = {
        int(r.doc_id)
        for _, r in docs_pdf.iterrows()
        if seeded_hash_py(str(r.doc_id), 11) % 1_000_000
        < int(fracs.get(r.lang, 0.2) * 1_000_000)
    }
    assert got == exp and len(got) > 0


def test_stratified_sample_stable_under_repartition(spark, documents):
    from project_gutenberg_full_text_search_spark.operators.etl import (
        stratified_sample,
    )

    fracs = {"en": 0.1}
    a = {
        r.doc_id
        for r in stratified_sample(documents, "lang", fracs, 0.3, seed=3).collect()
    }
    b = {
        r.doc_id
        for r in stratified_sample(
            documents.repartition(17), "lang", fracs, 0.3, seed=3
        ).collect()
    }
    assert a == b


def test_group_cap_sample_exact_and_deterministic(spark, documents, docs_pdf):
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_py,
    )
    from project_gutenberg_full_text_search_spark.operators.etl import (
        group_cap_sample,
    )

    cap = 7
    out = group_cap_sample(documents, "lang", cap, seed=11).collect()
    sizes = Counter(r.lang for r in out)
    full = Counter(docs_pdf.lang)
    for lang, n_full in full.items():
        assert sizes[lang] == min(cap, n_full)
    # survivors are exactly the cap lowest (hash, id) rows per group
    exp: set[int] = set()
    for lang in full:
        grp = docs_pdf[docs_pdf.lang == lang]
        ranked = sorted(
            (seeded_hash_py(str(d), 11), int(d)) for d in grp.doc_id
        )
        exp |= {d for _, d in ranked[:cap]}
    assert {r.doc_id for r in out} == exp
    # repartition-stable
    again = {
        r.doc_id
        for r in group_cap_sample(
            documents.repartition(13), "lang", cap, seed=11
        ).collect()
    }
    assert again == exp


def test_group_cap_keeps_small_groups_whole(spark):
    import pandas as pd

    from project_gutenberg_full_text_search_spark.operators.etl import (
        group_cap_sample,
    )

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(6), "g": ["a"] * 5 + ["b"]})
    )
    out = group_cap_sample(df, "g", 10).collect()
    assert len(out) == 6


# ---- contamination (n-gram overlap vs a reference set) ----


def test_ngram_overlap_exact_counts(spark):
    import pandas as pd

    from project_gutenberg_full_text_search_spark.operators.contamination import (
        ngram_overlap,
    )

    ref = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100], "content": ["the quick brown fox jumps"]})
    )
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "content": [
                    # full copy: shingles {tqb, qbf, bfj} all shared → 3
                    "the quick brown fox jumps",
                    # one shared trigram ("quick brown fox")
                    "a quick brown fox sleeps",
                    # same words, different order → no shared 3-gram
                    "fox brown quick the jumps",
                    # too short for a trigram
                    "quick brown",
                ],
            }
        )
    )
    got = {r.doc_id: r.n_overlap for r in ngram_overlap(docs, ref, n=3).collect()}
    assert got == {1: 3, 2: 1}


def test_ngram_overlap_counts_distinct_shingles_once(spark):
    import pandas as pd

    from project_gutenberg_full_text_search_spark.operators.contamination import (
        ngram_overlap,
    )

    ref = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "content": ["alpha beta gamma"]})
    )
    # the shared shingle appears twice in the doc → still counts once
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "content": ["alpha beta gamma delta alpha beta gamma"]}
        )
    )
    got = {r.doc_id: r.n_overlap for r in ngram_overlap(docs, ref, n=3).collect()}
    assert got == {1: 1}


def test_ngram_overlap_min_overlap_threshold(spark, documents):
    from project_gutenberg_full_text_search_spark.operators.contamination import (
        ngram_overlap,
    )

    ref = documents.filter(F.col("doc_id") % 97 == 0)
    rest = documents.filter(F.col("doc_id") % 97 != 0)
    all_hits = ngram_overlap(rest, ref, n=3, text_col="text").collect()
    thresh = ngram_overlap(
        rest, ref, n=3, text_col="text", min_overlap=3
    ).collect()
    exp = {r.doc_id for r in all_hits if r.n_overlap >= 3}
    assert {r.doc_id for r in thresh} == exp and len(exp) < len(all_hits)


# ---- token-budget shard packing ----


def test_pack_token_budget_semantics(spark, documents, docs_pdf):
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_py,
    )
    from project_gutenberg_full_text_search_spark.operators.etl import (
        pack_token_budget,
    )

    budget = 500
    out = pack_token_budget(
        documents, budget=budget, text_col="text", n_buckets=8, seed=11
    ).collect()
    assert len(out) == len(docs_pdf)
    # python twin: per-bucket prefix sum over id order
    rows = sorted(
        (seeded_hash_py(str(r.doc_id), 11) % 8, r.doc_id, r.n_tokens) for r in out
    )
    cum: dict[int, int] = {}
    exp_pack = {}
    for b, d, n in rows:
        cum[b] = cum.get(b, 0) + n
        exp_pack[d] = (b, (max(cum[b], 1) - 1) // budget)
    for r in out:
        assert (r.bucket, r.pack_id) == exp_pack[r.doc_id], r
    # the boundary-crossing doc OPENS a pack; everything after it fits
    # inside one budget (endpoints of non-first docs lie within the
    # pack's (p·B, (p+1)·B] range)
    by_pack: dict[tuple, list] = {}
    for b, d, n in rows:
        by_pack.setdefault((b, exp_pack[d][1]), []).append(n)
    for (b, p), toks in by_pack.items():
        assert sum(toks) - toks[0] <= budget
    # token counts match the tokenizer
    ntok = {int(r.doc_id): len(tokenize_str(r.text)) for _, r in docs_pdf.iterrows()}
    for r in out:
        assert r.n_tokens == ntok[r.doc_id]


def test_pack_token_budget_stable_under_repartition(spark, documents):
    from project_gutenberg_full_text_search_spark.operators.etl import (
        pack_token_budget,
    )

    a = sorted(
        map(tuple, pack_token_budget(
            documents, 500, text_col="text", n_buckets=8, seed=11
        ).collect())
    )
    b = sorted(
        map(tuple, pack_token_budget(
            documents.repartition(13), 500, text_col="text", n_buckets=8, seed=11
        ).collect())
    )
    assert a == b


def test_pack_token_budget_oversized_doc_gets_own_pack(spark):
    import pandas as pd

    from project_gutenberg_full_text_search_spark.operators.etl import (
        pack_token_budget,
    )

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "content": ["tiny doc", " ".join(f"w{i}" for i in range(50)), "x y"],
            }
        )
    )
    out = {r.doc_id: r.pack_id for r in pack_token_budget(
        df, budget=10, n_buckets=1, seed=11
    ).collect()}
    # doc 1 (2 toks) pack 0; doc 2 (50 toks, cum 52) floor(51/10)=5;
    # doc 3 (cum 54) also pack 5 — the oversized doc closed packs 0-4
    assert out == {1: 0, 2: 5, 3: 5}


# ---------------------------------------------------------------------------
# hot_passages — exact substring passage duplication
# ---------------------------------------------------------------------------


def test_hot_passages_exact_counts(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "a tale of the quick brown fox jumps over everything",
                    "short doc",  # shorter than window -> no passages
                    "the quick brown fox jumps over the quick brown fox jumps over",
                ],
            }
        )
    )
    out = {
        r.passage: (r.n_docs, r.n_occ)
        for r in dedup.hot_passages(df, window=6, min_docs=2).collect()
    }
    # "the quick brown fox jumps over" occurs in docs 1, 2, 4 (doc 4 twice)
    assert out["the quick brown fox jumps over"] == (3, 4)
    # "quick brown fox jumps over the" occurs in docs 1 and 4
    assert out["quick brown fox jumps over the"] == (2, 2)
    # nothing from doc 3, and no single-doc passages leak through
    assert all(nd >= 2 for nd, _ in out.values())


def test_hot_passages_python_twin(documents, docs_pdf):
    from collections import Counter, defaultdict

    W = 6
    occ: Counter = Counter()
    docs_of = defaultdict(set)
    for _, r in docs_pdf.iterrows():
        ws = [w for w in re.split(r"\s+", r.text) if w]
        for i in range(len(ws) - W + 1):
            p = " ".join(ws[i : i + W])
            occ[p] += 1
            docs_of[p].add(int(r.doc_id))
    exp = {
        p: (len(docs_of[p]), occ[p]) for p in occ if len(docs_of[p]) >= 2
    }
    got = {
        r.passage: (r.n_docs, r.n_occ)
        for r in dedup.hot_passages(documents, window=W, min_docs=2).collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# int8 scalar quantization
# ---------------------------------------------------------------------------


def test_quantize_int8_known_values(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [0, 1],
                "embedding": [[1.0, -0.5, 0.25, 0.0], [0.0, 0.0, 0.0, 0.0]],
            }
        )
    )
    rows = {r.vec_id: r for r in similarity.quantize_int8(df).collect()}
    # amax=1.0: codes = round-half-up(x*127) -> [127, -63, 32, 0]
    # (-0.5*127 = -63.5 -> floor(-63.0) = -63 under half-UP, not -64)
    assert rows[0].scale == 1.0
    assert list(rows[0].codes) == [127, -63, 32, 0]
    # zero vector -> zero codes, scale 0 (no NaN/div-by-zero)
    assert rows[1].scale == 0.0
    assert list(rows[1].codes) == [0, 0, 0, 0]


def test_quantize_int8_reconstruction_error_bounded(embeddings):
    q = similarity.quantize_int8(embeddings)
    joined = embeddings.join(q, "vec_id").select(
        F.max(
            F.array_max(
                F.zip_with(
                    "embedding",
                    "codes",
                    lambda x, c: F.abs(
                        x.cast("double") - c.cast("double") * F.col("scale") / 127.0
                    ),
                )
            )
            / F.greatest(F.col("scale"), F.lit(1e-12))
        ).alias("max_rel_err")
    ).collect()[0]
    # symmetric int8: worst-case relative error 0.5/127 of the vector max
    assert joined.max_rel_err <= 0.5 / 127.0 + 1e-9


def test_ann_quantized_topk_matches_exact_ranking(embeddings):
    """At dim 64 / int8, quantized cosine ranking should agree with exact
    float cosine on the clear-margin testdata query (vec 0 vs corpus)."""
    emb_row = embeddings.filter(F.col("vec_id") == 0).collect()[0]
    qv = [float(x) for x in emb_row.embedding]
    exact = [
        r.vec_id for r in similarity.cosine_topk(embeddings, qv, k=5).collect()
    ]
    quant = [
        r.vec_id
        for r in similarity.ann_quantized_topk(embeddings, query_id=0, k=5).collect()
    ]
    assert quant == exact


def test_ann_quantized_topk_is_integer_exact(spark):
    """The quantized score must be a pure function of the int8 codes —
    verified against a numpy int64 dot on a controlled frame."""
    import pandas as pd

    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype("float32")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(20), "embedding": [v.tolist() for v in vecs]}
        )
    )
    got = {
        r.vec_id: r.cos_q
        for r in similarity.ann_quantized_topk(df, query_id=3, k=20).collect()
    }
    codes = np.zeros((20, 8), dtype=np.int64)
    for i, v in enumerate(vecs):
        amax = float(np.abs(v.astype("float64")).max())
        if amax > 0:
            codes[i] = np.floor(v.astype("float64") / amax * 127.0 + 0.5)
    qc = codes[3]
    for i in range(20):
        idot = int((codes[i] * qc).sum())
        exp = idot / (
            math.sqrt(int((codes[i] ** 2).sum())) * math.sqrt(int((qc**2).sum()))
        )
        assert abs(got[i] - round(exp, 4)) < 1e-12


# ---------------------------------------------------------------------------
# repetition profile (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def test_repetition_profile_hand_values(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a a a b", ""]})
    )
    rows = {r.doc_id: r for r in textstats.repetition_profile(df).collect()}
    r1 = rows[1]
    assert r1.n_words == 4
    assert r1.distinct_word_ratio == 0.5
    assert r1.top_word_frac == 0.75
    # bigrams: "a a" x2, "a b" x1 -> 2/3
    assert r1.top_bigram_frac == 0.6667
    # empty doc: all zeros, no NaN
    r2 = rows[2]
    assert (r2.n_words, r2.distinct_word_ratio, r2.top_word_frac, r2.top_bigram_frac) == (
        0,
        0.0,
        0.0,
        0.0,
    )


def test_repetition_profile_arrow_impl_identical(documents):
    a = sorted(
        map(tuple, textstats.repetition_profile(documents, impl="explode").collect())
    )
    b = sorted(
        map(tuple, textstats.repetition_profile(documents, impl="arrow").collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_windows_partition_and_overlap(spark):
    from project_gutenberg_full_text_search_spark.operators.etl import chunk_windows

    rows = [
        (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks
        (2, "a b c"),  # shorter than window
        (3, ""),  # empty -> no chunks
        (4, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # stride == window: exact partition, no overlap
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_windows(df, window=4, stride=4).collect()
    }
    assert sorted(out) == [(1, 0), (1, 1), (1, 2), (2, 0), (4, 0)]
    assert out[(1, 0)]["chunk_text"] == "w0 w1 w2 w3"
    assert out[(1, 2)]["chunk_text"] == "w8 w9"  # short tail, never padded
    assert out[(1, 2)]["n_tokens"] == 2
    assert out[(2, 0)]["n_tokens"] == 3
    # stride < window: consecutive chunks share window-stride tokens
    ov = {
        r["chunk_id"]: r["chunk_text"]
        for r in chunk_windows(
            df.filter("doc_id = 1"), window=4, stride=2
        ).collect()
    }
    assert ov[0].split()[2:] == ov[1].split()[:2]
    # reconstruction: stride==window chunks concatenate back to the doc
    joined = " ".join(out[(1, i)]["chunk_text"] for i in range(3))
    assert joined == rows[0][1]


def test_chunk_windows_validates_params(spark):
    from project_gutenberg_full_text_search_spark.operators.etl import chunk_windows

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_windows(df, window=0, stride=1)
    with pytest.raises(ValueError):
        chunk_windows(df, window=4, stride=0)


# ---------------------------------------------------------------------------
# cross-doc repeated-segment removal (line-level)
# ---------------------------------------------------------------------------


def test_strip_hot_segments_lines(spark):
    banner = "# SPDX-License-Identifier: MIT"
    rows = [
        (1, f"{banner}\ndef f():\n    return 1"),
        (2, f"{banner}\ndef g():\n    return 2"),
        (3, f"{banner}\n{banner}\nunique line"),  # repeated banner inside one doc
        (4, banner),  # loses everything
        (5, "entirely original\ncontent here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.strip_hot_segments(df, delim="\n", min_docs=2).collect()
    }
    assert len(out) == 5  # one row per input doc, even fully-stripped ones
    assert out[1]["clean_text"] == "def f():\n    return 1"
    assert out[1]["n_kept"] == 2 and out[1]["n_dropped"] == 1
    # both occurrences inside doc 3 are dropped; order of survivors kept
    assert out[3]["clean_text"] == "unique line"
    assert out[3]["n_dropped"] == 2
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0
    assert out[5]["clean_text"] == rows[4][1] and out[5]["n_dropped"] == 0


def test_strip_hot_segments_threshold(spark):
    # a segment in exactly min_docs-1 docs survives
    rows = [(1, "shared\nown1"), (2, "shared\nown2"), (3, "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["clean_text"]
        for r in dedup.strip_hot_segments(df, delim="\n", min_docs=3).collect()
    }
    assert out[1] == "shared\nown1"  # df=2 < 3 -> kept


# ---------------------------------------------------------------------------
# TF-IDF top-k keyword extraction
# ---------------------------------------------------------------------------


def test_tfidf_top_terms_ranks_distinguishing_terms(spark):
    rows = [
        (1, "common common rareword rareword rareword"),
        (2, "common common common other"),
        (3, "common thing"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textstats.tfidf_top_terms(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top1 = {d: sorted(rs, key=lambda r: r["rnk"])[0]["term"] for d, rs in by_doc.items()}
    # the doc-unique repeated term beats the everywhere-term
    assert top1[1] == "rareword"
    n, df_common, df_rare = 3.0, 3.0, 1.0
    exp = round(3 * (math.log((n + 1) / (df_rare + 1)) + 1), 4)
    got = [r for r in by_doc[1] if r["term"] == "rareword"][0]["score"]
    assert got == pytest.approx(exp, abs=1e-9)
    # rnk is 1..k and unique per doc
    for d, rs in by_doc.items():
        assert sorted(r["rnk"] for r in rs) == list(range(1, len(rs) + 1))


def test_chunk_windows_matches_python_reference_randomized(spark):
    """One Spark job over 60 seeded-random docs x 3 (window, stride)
    configs vs a direct Python reference — covers tails, exact
    multiples, single-token docs, and heavy whitespace."""
    import random

    from project_gutenberg_full_text_search_spark.operators.etl import chunk_windows

    rng = random.Random(1234)
    vocab = [f"t{i}" for i in range(7)]
    rows = []
    for d in range(60):
        n = rng.choice([0, 1, 2, 3, 4, 5, 7, 8, 12, 29, 30, 31, 63])
        sep = rng.choice([" ", "  ", " \t ", "   "])
        rows.append((d, sep.join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def ref(text, w, s):
        toks = [t for t in re.split(r"\s+", text) if t]
        out = []
        cid = 0
        i = 0
        while i < len(toks):
            piece = toks[i : i + w]
            out.append((cid, len(piece), " ".join(piece)))
            if i + w >= len(toks):
                break
            cid += 1
            i += s
        return out

    for w, s in [(8, 8), (8, 5), (30, 10)]:
        got = sorted(
            map(tuple, chunk_windows(df, window=w, stride=s).collect())
        )
        exp = sorted(
            (d, cid, nt, txt)
            for d, text in rows
            for cid, nt, txt in ref(text, w, s)
        )
        assert got == exp, (w, s)


def _gopher_docs():
    """Crafted docs, one per Gopher rule violation + one clean pass."""
    clean = " ".join(
        ["the quick brown fox jumps over lazy dogs near a river bank"] * 6
    )  # 66 words, stopwords 'the'/'a', mean len ~4
    return [
        (0, clean),  # keep
        (1, "the a of to " + " ".join(["word"] * 10)),  # too few words (14)
        (2, "the a " + " ".join(["extraordinarily"] * 60)),  # mean word len > 10
        (3, "the a " + " ".join(["ab#"] * 60)),  # symbol ratio > 0.1
        (4, "the a " + " ".join(["1234"] * 60)),  # alpha ratio < 0.8
        (5, "the a\n" + "\n".join(["- bullet line here ok fine"] * 30)),  # bullets
        (6, "the a\n" + "\n".join(["trailing words here..."] * 30)),  # ellipsis
        (7, " ".join(["zebra"] * 60)),  # < 2 stopwords
    ]


def test_gopher_rules_verdicts_and_engine_parity(spark):
    import duckdb

    from project_gutenberg_full_text_search_spark.operators.textstats import (
        gopher_rules,
        gopher_rules_sql,
    )

    rows = _gopher_docs()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_rules(df).collect()}
    # doc 0 passes every rule; docs 1-7 each trip exactly their rule
    assert got[0]["keep"] is True
    for d in range(1, 8):
        assert got[d]["keep"] is False, (d, got[d])
    assert got[1]["n_words"] == 14
    assert got[2]["mean_word_len"] > 10
    assert got[3]["symbol_word_ratio"] > 0.1
    assert got[4]["alpha_word_ratio"] < 0.8
    assert got[5]["bullet_line_frac"] > 0.9
    assert got[6]["ellipsis_line_frac"] > 0.3
    assert got[7]["n_stopwords"] < 2

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    exp = con.execute(
        gopher_rules_sql("documents", "text") + " ORDER BY doc_id"
    ).fetchall()
    cols = [
        "doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
        "alpha_word_ratio", "bullet_line_frac", "ellipsis_line_frac",
        "n_stopwords", "keep",
    ]
    for row in exp:
        d = dict(zip(cols, row))
        assert got[d["doc_id"]] == d, d["doc_id"]


def test_shuffle_shards_is_deterministic_dense_permutation(spark):
    from project_gutenberg_full_text_search_spark.functions.hashing import (
        seeded_hash_py,
    )
    from project_gutenberg_full_text_search_spark.operators.etl import shuffle_shards

    df = spark.range(200).withColumnRenamed("id", "doc_id")
    got = shuffle_shards(df, n_shards=4, seed=13).collect()
    assert len(got) == 200

    # python reference: same hash, same shard, same within-shard order
    ref = sorted(
        (seeded_hash_py(str(i), 13) % 4, seeded_hash_py(str(i), 13), i)
        for i in range(200)
    )
    exp = {}
    pos = {}
    for sh, _, i in ref:
        exp[i] = (sh, pos.get(sh, 0))
        pos[sh] = pos.get(sh, 0) + 1
    for r in got:
        assert (r["shard"], r["pos"]) == exp[r["doc_id"]], r

    # dense 0..k-1 positions per shard
    by_shard = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for sh, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), sh

    # stable under physical repartitioning
    again = shuffle_shards(df.repartition(7), n_shards=4, seed=13).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))

    # a different seed is a different epoch order
    other = shuffle_shards(df, n_shards=4, seed=14).collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, got))

    import pytest as _pytest

    with _pytest.raises(ValueError):
        shuffle_shards(df, n_shards=0)
