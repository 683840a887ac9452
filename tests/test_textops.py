"""Training-data ops: dedup, similarity, text stats, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SEED = np.random.default_rng(7)


def _docs_with_dups(spark):
    """20 base docs + near-duplicates (1-word edits) + exact copies."""
    base = [
        " ".join(SEED.choice(list("abcdefghijklmnop"), 30).tolist()) for _ in range(20)
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
    # near-dups of docs 0..4: change one word out of 30 (J ~ 29/31 ~ 0.935)
    for i in range(5):
        words = base[i].split(" ")
        words[0] = "zzz"
        rows.append((100 + i, " ".join(words)))
    # exact copies of docs 5,6
    rows.append((200, base[5]))
    rows.append((201, base[6]))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.mark.spark
def test_exact_dedup(spark):
    from orc_rs_spark.textops.dedup import exact_dedup

    docs = _docs_with_dups(spark)
    out = exact_dedup(docs)
    # 27 rows, 25 distinct texts (two exact copies collapse)
    assert out.count() == 25
    assert out.agg(F.sum("n_copies")).collect()[0][0] == 27


@pytest.mark.spark
def test_minhash_lsh_equals_exact_jaccard(spark):
    from orc_rs_spark.textops.dedup import jaccard_pairs, minhash_lsh_pairs

    docs = _docs_with_dups(spark)
    exact = {tuple(r) for r in jaccard_pairs(docs, threshold=0.8).collect()}
    lsh = {tuple(r) for r in minhash_lsh_pairs(docs, threshold=0.8).collect()}
    assert exact == lsh
    # the near-dup pairs must be found
    assert (0, 100) in exact or (100, 0) in exact


@pytest.mark.spark
def test_simhash_near_dups_close(spark):
    from orc_rs_spark.textops.dedup import simhash

    docs = _docs_with_dups(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    # near-dup should be far closer than a random pair
    near = ham(sigs[0], sigs[100])
    far = np.median([ham(sigs[0], sigs[i]) for i in range(1, 20)])
    assert near < far
    # exact copies -> identical signature
    assert sigs[5] == sigs[200]


@pytest.mark.spark
def test_embedding_dup_pairs_and_topk(spark):
    from orc_rs_spark.textops.dedup import embedding_dup_pairs
    from orc_rs_spark.textops.similarity import ann_topk_lsh, cosine_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 64)).astype(np.float32)
    vecs[7] = vecs[3] + 0.01 * rng.standard_normal(64).astype(np.float32)  # near-dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    pairs = embedding_dup_pairs(emb, threshold=0.99).collect()
    assert [(r["v1"], r["v2"]) for r in pairs] == [(3, 7)]

    q = [float(x) for x in vecs[3]]
    exact = [r["vec_id"] for r in cosine_topk(emb.where(F.col("vec_id") != 3), q, k=5).collect()]
    assert exact[0] == 7  # the near-dup is rank 1
    ann = [r["vec_id"] for r in ann_topk_lsh(emb.where(F.col("vec_id") != 3), q, k=5, bits=8).collect()]
    assert 7 in ann  # LSH with multi-probe must recall the near-dup


@pytest.mark.spark
def test_text_stats_and_quality(spark):
    from orc_rs_spark.textops.textstats import langid, quality_score, text_stats, token_counts

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat. it is a good mat, truly!"),
            (2, "x" * 20000),
            (3, "der hund ist nicht ein katze und das ist gut"),
            (4, "1234 5678 9!!!"),
        ],
        "doc_id bigint, text string",
    )
    st = {r["doc_id"]: r for r in text_stats(docs).collect()}
    assert st[1]["n_words"] == 12
    assert st[1]["n_punct"] == 3  # two periods (. after mat and ,) + !
    assert st[4]["n_digits"] == 9
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert q[1] > q[2] and q[1] > q[4]
    tc = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert tc[1]["n_bpe_tokens"] > tc[1]["n_ws_tokens"]  # punct split out
    lid = {r["doc_id"]: r["pred_lang"] for r in langid(docs).collect()}
    assert lid[1] == "en" and lid[3] == "de"


@pytest.mark.spark
def test_multimodal_plumbing(spark):
    from orc_rs_spark.textops.multimodal import attach_media, extract_features

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc here")], "doc_id bigint, text string"
    )
    media = attach_media(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert bytes(rows[1]["payload"]) == b"hello world"
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert len(feats[1]["feature"]) == 16
    assert 8 <= feats[1]["width"] <= 15
    # deterministic across runs
    feats2 = {r["doc_id"]: r for r in extract_features(attach_media(docs)).collect()}
    assert feats[1]["feature"] == feats2[1]["feature"]


@pytest.mark.spark
def test_simhash_pairs_pigeonhole_equals_bruteforce(spark):
    """Band-bucketed pair mining must find exactly the brute-force
    Hamming<=k pair set (pigeonhole recall is exact, not probabilistic)."""
    from orc_rs_spark.textops.dedup import simhash, simhash_pairs

    docs = _docs_with_dups(spark)
    sig = {r["doc_id"]: r["simhash"] for r in simhash(docs, bits=60, hash_fn="md5_60").collect()}
    ids = sorted(sig)
    expect = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    got = {(r["d1"], r["d2"]) for r in simhash_pairs(docs, max_hamming=3).collect()}
    assert got == expect
    assert expect, "fixture should contain at least one near-dup pair"


def _clustered_embeddings(spark, n_clusters=8, per=6, dim=64):
    """Tight clusters (cos >= ~0.95 within, ~0 across): the LSH sweet spot."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        c = rng.standard_normal(dim)
        c /= np.linalg.norm(c)
        for _ in range(per):
            # noise norm ~0.03*sqrt(64)=0.24 -> within-cluster cos ~0.95
            v = c + 0.03 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


@pytest.mark.spark
def test_embedding_lsh_pairs_equals_exact(spark):
    from orc_rs_spark.textops.dedup import embedding_dup_pairs, embedding_lsh_pairs

    emb = _clustered_embeddings(spark)
    exact = {(r["v1"], r["v2"]) for r in embedding_dup_pairs(emb, threshold=0.9).collect()}
    lsh = {
        (r["v1"], r["v2"])
        for r in embedding_lsh_pairs(emb, threshold=0.9, bands=32, rows_per_band=8).collect()
    }
    assert lsh == exact
    assert len(exact) >= 8 * 15  # every within-cluster pair qualifies


@pytest.mark.spark
def test_embedding_block_pairs_equals_exact(spark):
    from orc_rs_spark.textops.dedup import embedding_block_pairs, embedding_dup_pairs

    emb = _clustered_embeddings(spark)
    exact = {(r["v1"], r["v2"]) for r in embedding_dup_pairs(emb, threshold=0.9).collect()}
    blocked = {
        (r["v1"], r["v2"]) for r in embedding_block_pairs(emb, threshold=0.9, block_size=7).collect()
    }
    assert blocked == exact


@pytest.mark.spark
def test_dup_clusters_connected_components(spark):
    from orc_rs_spark.textops.dedup import dup_clusters

    # two chains + one triangle + isolated pair: known components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "d1 bigint, d2 bigint",
    )
    got = {(r["doc_id"], r["cluster_id"]) for r in dup_clusters(pairs).collect()}
    expect = {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (20, 20), (21, 20), (22, 20)}
    assert got == expect


@pytest.mark.spark
def test_ann_lsh_with_persisted_signatures(spark):
    """The scale path: signatures computed once, persisted, and passed to
    each query via sigs= — results identical to the recompute path."""
    from orc_rs_spark.textops.similarity import ann_topk_lsh, hyperplane_signatures

    rng = np.random.default_rng(5)
    vecs = rng.standard_normal((200, 64)).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    q = [float(x) for x in vecs[0]]
    sub = emb.where(F.col("vec_id") != 0)
    sigs = hyperplane_signatures(sub, bits=8).cache()
    with_sigs = [r["vec_id"] for r in ann_topk_lsh(sub, q, k=5, bits=8, sigs=sigs).collect()]
    recompute = [r["vec_id"] for r in ann_topk_lsh(sub, q, k=5, bits=8).collect()]
    assert with_sigs == recompute
    with pytest.raises(ValueError, match="n_hint"):
        ann_topk_lsh(sub, q, k=5)  # no bits, no n_hint: must refuse to scan
    sigs.unpersist()


def test_bmp_wav_codecs_roundtrip():
    """Pure-NumPy BMP/WAV codecs: encode -> decode is exact."""
    from orc_rs_spark.textops.multimodal import decode_bmp, decode_wav, make_bmp, make_wav

    rng = np.random.default_rng(9)
    for h, w in [(8, 8), (11, 13), (16, 9)]:
        pix = rng.integers(0, 256, (h, w)).astype(np.uint8)
        assert np.array_equal(decode_bmp(make_bmp(pix)), pix)
    samples = rng.integers(-32768, 32767, 777).astype(np.int16)
    dec, rate = decode_wav(make_wav(samples, rate=8000))
    assert rate == 8000 and np.array_equal(dec, samples)


@pytest.mark.spark
def test_attach_real_media_and_features(spark):
    from orc_rs_spark.textops.multimodal import attach_real_media, decode_bmp, extract_features

    docs = spark.createDataFrame(
        [(0, "hello world " * 5, 60), (1, "audio text " * 8, 88)],
        "doc_id bigint, text string, n_chars bigint",
    )
    media = {r["doc_id"]: r for r in attach_real_media(docs).collect()}
    assert media[0]["media_type"] == "image/bmp"
    assert media[1]["media_type"] == "audio/wav"
    # payload is genuinely decodable
    img = decode_bmp(bytes(media[0]["payload"]))
    assert img.shape == (8 + (60 // 9) % 9, 8 + 60 % 9)
    feats = {r["doc_id"]: r for r in extract_features(attach_real_media(docs)).collect()}
    assert len(feats[0]["feature"]) == 16 and len(feats[1]["feature"]) == 16
    assert feats[1]["height"] == 1 and feats[1]["width"] == 64 + 88 % 129


def test_unpack_vec_block_arrow_native():
    """Blocked-matmul input path: ids + matrix come from Arrow buffers
    (no per-vector to_pylist)."""
    import pyarrow as pa

    from orc_rs_spark.textops.dedup import _unpack_vec_block

    rows = [
        [{"vec_id": 3, "embedding": [1.0, 2.0]}, {"vec_id": 9, "embedding": [0.5, -1.0]}],
        [{"vec_id": 4, "embedding": [7.0, 8.0]}],
    ]
    col = pa.array(rows, type=pa.list_(
        pa.struct([("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))])
    ))
    ids, mat = _unpack_vec_block(col, 0)
    assert ids.dtype == np.int64 and mat.dtype == np.float64
    assert ids.tolist() == [3, 9] and mat.tolist() == [[1.0, 2.0], [0.5, -1.0]]
    ids2, mat2 = _unpack_vec_block(col, 1)
    assert ids2.tolist() == [4] and mat2.tolist() == [[7.0, 8.0]]


@pytest.mark.spark
def test_ann_ivf_pipeline_and_recall(spark):
    """IVF: nprobe == n_clusters is loss-free (equals exact top-k);
    nprobe < n_clusters keeps high recall on clustered data while
    scanning only the probed lists."""
    from orc_rs_spark.textops.similarity import (
        ann_topk_ivf,
        cosine_topk,
        ivf_assign,
        ivf_centroids,
    )

    rng = np.random.default_rng(9)
    # clustered corpus: 8 centers, 40 points each
    centers = rng.standard_normal((8, 64)) * 4
    vecs = np.concatenate(
        [c + rng.standard_normal((40, 64)) * 0.3 for c in centers]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    q = [float(x) for x in vecs[17]]
    exact = [r["vec_id"] for r in
             cosine_topk(emb.where(F.col("vec_id") != 17), q, k=10).collect()]

    # all-probe == exact (what the driver oracle relies on)
    allp = [
        r["vec_id"] for r in ann_topk_ivf(
            emb.where(F.col("vec_id") != 17), q, k=10, n_clusters=8, nprobe=8
        ).collect()
    ]
    assert allp == exact

    # pruned probe: reuse the built index (the production shape), check
    # recall and that the scanned candidate set actually shrank
    cents = ivf_centroids(emb, n_clusters=8, sample_ids=1 << 30)
    assigns = ivf_assign(emb, cents).cache()
    pruned = [r["vec_id"] for r in ann_topk_ivf(
        emb.where(F.col("vec_id") != 17), q, k=10, n_clusters=8, nprobe=2,
        centroids=cents, assignments=assigns,
    ).collect()]
    recall = len(set(pruned) & set(exact)) / len(exact)
    assert recall >= 0.9, (recall, pruned, exact)
    sizes = assigns.groupBy("cluster").count().collect()
    assert len(sizes) >= 6  # k-means actually spread the corpus
    assigns.unpersist()


def test_multimodal_synthesis_matches_scalar_codecs_and_buckets():
    """The bucketed media build must emit byte-identical payloads to the
    scalar make_bmp/make_wav path, with Python-level codec work scaling in
    GEOMETRY BUCKETS (make_bmp called once per distinct (w, h) for the
    header), never per row."""
    import pyarrow as pa

    from orc_rs_spark.textops import multimodal as mm

    rng = np.random.default_rng(11)
    n = 400
    texts = ["".join(chr(65 + int(c)) for c in rng.integers(0, 26, int(k)))
             for k in rng.integers(0, 400, n)]
    ids = np.arange(n, dtype=np.int64)
    ncs = np.array([len(t) for t in texts], dtype=np.int64)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(ids), pa.array(texts), pa.array(ncs)],
        names=["doc_id", "text", "n_chars"],
    )
    calls = {"bmp": 0, "wav": 0}
    real_bmp, real_wav = mm.make_bmp, mm.make_wav

    def bmp_counting(pix):
        calls["bmp"] += 1
        return real_bmp(pix)

    def wav_counting(s, rate=16000):
        calls["wav"] += 1
        return real_wav(s, rate)

    mm.make_bmp, mm.make_wav = bmp_counting, wav_counting
    try:
        out = mm.synthesize_media_batch(batch)  # the mapInArrow body
    finally:
        mm.make_bmp, mm.make_wav = real_bmp, real_wav

    # scalar reference payloads
    for i in range(n):
        raw = np.frombuffer(texts[i].encode(), dtype=np.uint8)
        nc = ncs[i]
        if i % 2 == 0:
            w, h = 8 + nc % 9, 8 + (nc // 9) % 9
            want = real_bmp(np.resize(raw, (h, w)).astype(np.uint8))
        else:
            ns = 64 + nc % 129
            want = real_wav((np.resize(raw, ns).astype(np.int16) - 128) * 256)
        assert out.column("payload")[i].as_py() == want, f"row {i}"
    # python codec calls == bucket count (headers only), not row count
    n_bmp_buckets = len({(int(8 + nc % 9), int(8 + (nc // 9) % 9))
                         for i, nc in zip(ids, ncs) if i % 2 == 0})
    n_wav_buckets = len({int(64 + nc % 129) for i, nc in zip(ids, ncs) if i % 2 == 1})
    assert calls["bmp"] == n_bmp_buckets < n / 2
    assert calls["wav"] == n_wav_buckets < n / 2


@pytest.mark.spark
def test_ivf_persisted_index_partition_pruned(spark, tmp_path):
    """The persisted IVF layout must (a) return the exact top-k when every
    list is probed, (b) reach the parquet scan as a PARTITION filter on
    cluster (pruned directories, not row filtering), and (c) at
    nprobe=1 read a strict subset of partitions."""
    from orc_rs_spark.textops.similarity import (
        ann_topk_ivf_indexed,
        cosine_topk,
        ivf_build_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where("vec_id = 0").first()["embedding"]
    corpus = emb.where("vec_id != 0")
    idx = str(tmp_path / "ivf")
    cent = ivf_build_index(corpus, idx, n_clusters=8)
    assert cent.shape[0] == 8
    # all-probe == exact
    got = [r["vec_id"] for r in ann_topk_ivf_indexed(spark, idx, list(q), k=10, nprobe=8).collect()]
    want = [r["vec_id"] for r in cosine_topk(corpus, list(q), k=10).collect()]
    assert got == want
    # the probe is partition pruning, visible in the physical plan
    sub = spark.read.parquet(f"{idx}/vectors").where("cluster IN (3, 5)")
    plan = sub._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan.split("PartitionFilters")[1][:200]
    # nprobe=1 scans fewer rows than the corpus (subset partitions)
    one = ann_topk_ivf_indexed(spark, idx, list(q), k=10, nprobe=1)
    n_probed = spark.read.parquet(f"{idx}/vectors").where(
        f"cluster = {int(np.argmax(cent @ (np.array(q) / np.linalg.norm(q))))}"
    ).count()
    assert 0 < n_probed < corpus.count()
    assert len(one.collect()) == 10


def test_multimodal_empty_and_hostile_payloads():
    """Round-4 review bugs: an empty text as the batch's LAST row must not
    index past the buffer, and a lying BMP/WAV header must raise instead
    of silently pooling bytes from a NEIGHBORING row's payload."""
    import pyarrow as pa

    from orc_rs_spark.textops import multimodal as mm

    # empty trailing text: payload must match the scalar codec on zeros
    batch = pa.RecordBatch.from_arrays(
        [pa.array([0, 2], type=pa.int64()), pa.array(["hello", ""]),
         pa.array([5, 0], type=pa.int64())],
        names=["doc_id", "text", "n_chars"],
    )
    out = mm.synthesize_media_batch(batch)
    want = mm.make_bmp(np.zeros((8, 8), dtype=np.uint8))
    assert out.column("payload")[1].as_py() == want
    # all-empty batch (zero-length data buffer)
    b2 = pa.RecordBatch.from_arrays(
        [pa.array([0], type=pa.int64()), pa.array([""]), pa.array([0], type=pa.int64())],
        names=["doc_id", "text", "n_chars"],
    )
    assert mm.synthesize_media_batch(b2).column("n_bytes")[0].as_py() == len(want)

    # hostile BMP header: declared geometry larger than the payload
    good = mm.make_bmp(np.zeros((8, 8), dtype=np.uint8))
    lying = bytearray(good)
    lying[22:26] = (1000).to_bytes(4, "little")  # height 1000, same bytes
    fx = mm.extract_features.__wrapped__ if hasattr(mm.extract_features, "__wrapped__") else None
    # drive the mapInArrow body through a direct call path
    med = pa.RecordBatch.from_arrays(
        [pa.array([1, 2], type=pa.int64()),
         pa.array([good, bytes(lying)], type=pa.binary()),
         pa.array(["image/bmp", "image/bmp"])],
        names=["doc_id", "payload", "media_type"],
    )

    class _Cap:
        def mapInArrow(self, fn, ddl):
            self.fn = fn
            return self

    cap = _Cap()
    mm.extract_features(cap)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="truncated BMP"):
        list(cap.fn(iter([med])))
    # truncated WAV data chunk
    wav = bytearray(mm.make_wav(np.zeros(64, dtype=np.int16)))
    wav[40:44] = (10**6).to_bytes(4, "little")  # data size lies
    med2 = pa.RecordBatch.from_arrays(
        [pa.array([1], type=pa.int64()), pa.array([bytes(wav)], type=pa.binary()),
         pa.array(["audio/wav"])],
        names=["doc_id", "payload", "media_type"],
    )
    cap2 = _Cap()
    mm.extract_features(cap2)
    with _pytest.raises(ValueError, match="truncated WAV"):
        list(cap2.fn(iter([med2])))


def test_lsh_degenerate_bucket_guard(spark):
    """10^4 near-identical docs (the web-corpus boilerplate case) all land
    in the same LSH band buckets; the uncapped self-join would mint
    C^2/2 = 5x10^7 candidates. The bucket_cap guard degrades oversized
    buckets to sub-bucket pairs + an anchor chain: candidate volume stays O(C * bands) and
    the cluster still comes out CONNECTED (what dup_clusters needs)."""
    from pyspark.sql import functions as F

    from orc_rs_spark.textops.dedup import (
        _capped_band_pairs,
        dup_clusters,
        minhash_lsh_pairs,
        simhash_pairs,
    )

    n = 10_000
    # structural check on the guard itself: one mega-bucket, capped
    stacked = (
        spark.range(n)
        .select(
            F.concat(F.lit("doc"), F.format_string("%05d", F.col("id"))).alias("doc_id"),
            F.lit(0).alias("band"),
            F.lit(12345).cast("long").alias("val"),
        )
    )
    small, extra = _capped_band_pairs(stacked, "doc_id", bucket_cap=1000)
    assert small.count() == 0  # every row is in the oversized bucket
    n_pairs = extra.count()
    # sub-bucket all-pairs + anchor chain: O(n * sqrt(cap)), nowhere near C^2/2
    sub = max(2, int(1000 ** 0.5))
    assert n_pairs <= n * sub
    assert n_pairs < (n * (n - 1)) // 20
    # the guard connects the whole bucket
    clusters = dup_clusters(extra.select("d1", "d2"))
    assert clusters.select("cluster_id").distinct().count() == 1

    # end-to-end: identical texts through the real operators finish with
    # linear candidate volume and one connected cluster (uncapped this
    # would be a 5x10^7-pair join)
    docs = spark.range(2000).select(
        F.format_string("d%05d", F.col("id")).alias("doc_id"),
        F.lit("the same boilerplate page text repeated everywhere forever").alias("text"),
    )
    mh = minhash_lsh_pairs(docs, bucket_cap=200)
    assert dup_clusters(mh).select("cluster_id").distinct().count() == 1
    sh = simhash_pairs(docs, bucket_cap=200)
    assert dup_clusters(sh).select("cluster_id").distinct().count() == 1


def test_dup_clusters_chain_graph_converges(spark):
    """Pointer doubling makes connected components O(log diameter): a
    4000-node pure chain (the pathological case for plain min-label
    propagation, which needs diameter rounds) converges within the
    default max_iter and labels every node with the chain head."""
    from pyspark.sql import functions as F

    from orc_rs_spark.textops.dedup import dup_clusters

    n = 4000
    edges = spark.range(n - 1).select(
        F.format_string("c%06d", F.col("id")).alias("d1"),
        F.format_string("c%06d", F.col("id") + 1).alias("d2"),
    )
    out = dup_clusters(edges)
    assert out.count() == n
    assert out.select("cluster_id").distinct().collect()[0][0] == "c000000"


def test_bucket_cap_none_restores_exhaustive_recall(spark):
    """bucket_cap=None (round-5 ADVICE) disables the degenerate-bucket
    guard: the published exact contracts (simhash pigeonhole recall = 1,
    minhash == exact jaccard_pairs) hold unconditionally again, at the
    documented C^2 worst-case price."""
    from pyspark.sql import functions as F

    from orc_rs_spark.textops.dedup import _capped_band_pairs, simhash_pairs

    n = 120
    stacked = spark.range(n).select(
        F.format_string("d%05d", F.col("id")).alias("doc_id"),
        F.lit(0).alias("band"),
        F.lit(12345).cast("long").alias("val"),
    )
    small, extra = _capped_band_pairs(stacked, "doc_id", bucket_cap=None)
    assert small.count() == n and extra.count() == 0
    small0, extra0 = _capped_band_pairs(stacked, "doc_id", bucket_cap=0)
    assert small0.count() == n and extra0.count() == 0

    # identical texts, cluster far above a tiny cap: the capped run drops
    # cross-sub-bucket pairs by design; cap=None returns every C(n,2) pair
    docs = spark.range(n).select(
        F.format_string("d%05d", F.col("id")).alias("doc_id"),
        F.lit("the same boilerplate page text repeated everywhere").alias("text"),
    )
    assert simhash_pairs(docs, bucket_cap=None).count() == n * (n - 1) // 2
    assert simhash_pairs(docs, bucket_cap=16).count() < n * (n - 1) // 2
