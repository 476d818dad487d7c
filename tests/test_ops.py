"""Training-data ops tests: dedup family, ANN, text stats, multimodal
plumbing, metrics — verified against brute-force / duckdb ground truth."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture(scope="module")
def docs_ds():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "the quick brown fox jumps over a lazy dog today",  # near dup
        "completely different content about ray data pipelines",
        "another unrelated document mentioning apache arrow tables",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "short text",
        "",
    ]
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def test_exact_dedup(docs_ds):
    from elasticsearch_ray.ops.dedup import exact_dedup

    out = {r["doc_id"]: r["dupes"] for r in exact_dedup(docs_ds).take_all()}
    assert out[0] == 3  # docs 0, 1, 5 identical
    assert 1 not in out and 5 not in out
    assert out[2] == 1 and out[3] == 1


def test_minhash_lsh_dedup(docs_ds):
    from elasticsearch_ray.ops.dedup import minhash_lsh_dedup

    dups = {r["doc_id"] for r in minhash_lsh_dedup(docs_ds).take_all()}
    # exact dups of doc 0 must be flagged; unrelated docs must not
    assert {1, 5} <= dups
    assert 3 not in dups and 4 not in dups


def test_simhash_dedup(docs_ds):
    from elasticsearch_ray.ops.dedup import simhash_dedup

    out = {r["doc_id"]: r["near_of"] for r in simhash_dedup(docs_ds).take_all()}
    assert out.get(1) == 0 and out.get(5) == 0
    assert 3 not in out and 4 not in out


def test_ngram_jaccard():
    from elasticsearch_ray.ops.dedup import ngram_jaccard

    a = "the quick brown fox jumps".split()
    assert ngram_jaccard(a, a) == 1.0
    assert ngram_jaccard(a, "totally different words here now".split()) == 0.0
    assert 0.0 < ngram_jaccard(a, "the quick brown fox sleeps".split()) < 1.0


@pytest.fixture(scope="module")
def emb_ds():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    vecs[7] = vecs[2] * 1.001  # near-dup pair (2, 7)
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs],
                                      pa.list_(pa.float32())),
            }
        )
    ), vecs


def test_embedding_cosine_dedup(emb_ds):
    from elasticsearch_ray.ops.dedup import embedding_cosine_dedup

    ds, _ = emb_ds
    out = {r["vec_id"]: r["near_of"] for r in
           embedding_cosine_dedup(ds, threshold=0.999).take_all()}
    assert out == {7: 2}


def test_embedding_dedup_bucketed_vs_bruteforce():
    from elasticsearch_ray.ops.dedup import (
        embedding_cosine_dedup,
        embedding_cosine_dedup_bruteforce,
    )

    rng = np.random.default_rng(9)
    base = rng.normal(size=(120, 16)).astype(np.float32)
    for j in range(20):  # plant near-dups of random earlier rows
        src = int(rng.integers(0, 100))
        base[100 + j] = base[src] + rng.normal(scale=1e-3, size=16).astype(np.float32)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(120), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in base], pa.list_(pa.float32())
                ),
            }
        )
    )
    got = {
        r["vec_id"]
        for r in embedding_cosine_dedup(ds, threshold=0.999, n_clusters=8).take_all()
    }
    exp = {
        r["vec_id"]
        for r in embedding_cosine_dedup_bruteforce(ds, threshold=0.999).take_all()
    }
    assert exp  # the planted dups are found by the oracle
    assert got <= exp  # bucket verify is exact cosine: no false positives
    assert len(got & exp) / len(exp) >= 0.9  # recall over buckets


def test_ann_brute_force_exact(emb_ds):
    from elasticsearch_ray.ops.ann import brute_force_topk

    ds, vecs = emb_ds
    q = vecs[:3].astype(np.float64)
    t = brute_force_topk(ds, q, k=5)
    # ground truth by numpy
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = qn @ vn.T
    for qi in range(3):
        order = np.lexsort((np.arange(40), -sims[qi]))[:5]
        got = t.filter(pa.compute.equal(t.column("query_id"), qi))
        assert got.column("vec_id").to_pylist() == list(order), qi
    # self is always rank 1 with cos ~1
    r1 = t.filter(pa.compute.equal(t.column("rank"), 1))
    assert r1.column("vec_id").to_pylist()[:3] == [0, 1, 2]


def test_ann_ivf_recall(emb_ds):
    from elasticsearch_ray.ops.ann import brute_force_topk, ivf_topk

    ds, vecs = emb_ds
    q = vecs[:3].astype(np.float64)
    bf = brute_force_topk(ds, q, k=5)
    ivf = ivf_topk(ds, q, k=5, n_clusters=4, nprobe=2)
    # recall@5 >= 0.6 on this tiny set
    hits = 0
    for qi in range(3):
        b = set(bf.filter(pa.compute.equal(bf.column("query_id"), qi)).column("vec_id").to_pylist())
        v = set(ivf.filter(pa.compute.equal(ivf.column("query_id"), qi)).column("vec_id").to_pylist())
        hits += len(b & v)
    assert hits >= 9


def test_ann_ivf_rescore_matches_brute_over_probes(emb_ds, tmp_path):
    """The float64 exact-rerank path: for every query, the rescore result
    must equal brute-force float64 cosine top-k restricted to exactly the
    probed candidate set (same pairs, same (-cos, vec_id) tie-break)."""
    from elasticsearch_ray.ops.ann import (
        ivf_build,
        ivf_probe_pairs,
        ivf_query_rescore,
    )

    ds, vecs = emb_ds
    q = vecs[:3].astype(np.float64)
    idx = str(tmp_path / "ivf")
    ivf_build(ds, idx, n_clusters=4, sample_size=40)
    pairs = ivf_probe_pairs(idx, q, nprobe=2)
    assert pairs.num_rows > 0
    got = ivf_query_rescore(idx, ds, q, k=5, nprobe=2, probe_pairs=pairs)
    # ground truth: float64 cosine over the probed pairs only
    vn = vecs.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    pq_ = pairs.column("query_id").to_numpy()
    pv_ = pairs.column("vec_id").to_numpy()
    for qi in range(3):
        cand = np.unique(pv_[pq_ == qi])
        sims = vn[cand] @ qn[qi]
        order = np.lexsort((cand, -sims))[:5]
        g = got.filter(pa.compute.equal(got.column("query_id"), qi))
        assert g.column("vec_id").to_pylist() == cand[order].tolist(), qi
        assert np.allclose(g.column("cos").to_numpy(), sims[order], atol=1e-12)


def test_quality_langid_vectorized_bit_identical():
    """The ASCII-fast-path quality/langid kernels must be bit-identical to
    the per-text Python semantics, including unicode/control-char fallbacks,
    empties and None."""
    import random

    from elasticsearch_ray.ops.textstats import (
        _langid_py,
        _quality_py_row,
        language_id,
        quality_feature_arrays,
    )

    random.seed(11)
    vocab = ["the", "and", "of", "der", "und", "le", "la", "Foo", "bar123",
             "élan", "naïve", "データ", "x" * 40, "it's", ";;;", "42",
             "tab\there", "\x1cctl"]
    texts = []
    for _ in range(400):
        t = " ".join(random.choice(vocab) for _ in range(random.randint(0, 25)))
        if random.random() < 0.1:
            t += random.choice(["\n\n", "\x0b", " 𝔘ni", "\x7f"])
        texts.append(t)
    texts += [None, "", " ", "\t\n", "the the the", "a" * 500]
    feats = quality_feature_arrays(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        exp = _quality_py_row(t)
        got = (feats["n_chars"][i], feats["n_words"][i], feats["stop_ratio"][i],
               feats["punct_ratio"][i], feats["digit_ratio"][i],
               feats["mean_word_len"][i])
        assert tuple(got) == exp, (i, repr(t)[:60])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(ds).take_all()}
    for i, t in enumerate(texts):
        assert got[i] == _langid_py(t), (i, repr(t)[:60])


def test_textstats(docs_ds):
    from elasticsearch_ray.ops.textstats import (
        fingerprints,
        language_id,
        quality_scores,
        token_counts,
    )

    tc = {r["doc_id"]: r for r in token_counts(docs_ds).take_all()}
    assert tc[0]["ws_tokens"] == 9
    assert tc[7]["ws_tokens"] == 0

    li = {r["doc_id"]: r["lang_pred"] for r in language_id(docs_ds).take_all()}
    assert li[0] == "en" and li[7] == "und"

    qs = {r["doc_id"]: r for r in quality_scores(docs_ds).take_all()}
    assert qs[0]["n_words"] == 9
    assert 0.0 <= qs[0]["quality"] <= 1.0

    fp = {r["doc_id"]: r for r in fingerprints(docs_ds).take_all()}
    # identical texts -> identical fingerprints; different texts differ
    assert fp[0]["fp_min"] == fp[1]["fp_min"] == fp[5]["fp_min"]
    assert fp[0]["fp_full"] != fp[3]["fp_full"]


def test_multimodal_plumbing(docs_ds):
    from elasticsearch_ray.ops.multimodal import (
        BinaryFeatureExtractor,
        extract_binary_features,
    )

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(
                    [s.encode() for s in t.column("text").to_pylist()], pa.binary()
                ),
            }
        )

    ds = docs_ds.map_batches(to_payload, batch_format="pyarrow")
    out = {r["doc_id"]: r for r in extract_binary_features(ds).take_all()}
    assert len(out[0]["feature"]) == 16
    assert out[0]["payload_bytes"] == len(
        "the quick brown fox jumps over the lazy dog".encode()
    )
    # deterministic features; identical payloads -> identical features
    assert list(out[0]["feature"]) == list(out[1]["feature"])
    # strict mode always has a real codec now (Pillow or the pure
    # PNG/BMP fallback) — construction never raises
    fx = BinaryFeatureExtractor(mode="strict")
    assert fx.backend in ("pillow", "imagecodec")


def test_metrics_reference_semantics():
    from elasticsearch_ray.metrics import evaluate, ndcg, average_precision

    retrieved = [1, 2, 3, 4]
    relevant = [2, 4, 9]
    m = evaluate(retrieved, relevant, k=4)
    assert m["precision"] == 0.5
    assert m["recall"] == pytest.approx(2 / 3)
    assert m["rr"] == 0.5
    assert average_precision(retrieved, relevant) == pytest.approx(
        (1 / 2 + 2 / 4) / 3
    )
    assert 0 < ndcg(retrieved, relevant, 4) < 1
    assert evaluate([], relevant, 4)["precision"] == 0.0
    assert evaluate(retrieved, [], 4)["recall"] == 0.0


def test_minhash_verify_filter(docs_ds):
    from elasticsearch_ray.ops.dedup import minhash_lsh_dedup

    # strict verification keeps exact dups, drops weak collisions
    strict = {r["doc_id"] for r in
              minhash_lsh_dedup(docs_ds, verify_jaccard=0.9).take_all()}
    assert {1, 5} <= strict
    loose = {r["doc_id"] for r in
             minhash_lsh_dedup(docs_ds, verify_jaccard=0.0).take_all()}
    assert strict <= loose


def test_multimodal_resize_and_frames(docs_ds):
    import ray.data

    from elasticsearch_ray.ops.multimodal import FrameSampleStub, ImageResizeStub

    def to_payload(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(
                    [(s * 20).encode() for s in t.column("text").to_pylist()],
                    pa.binary(),
                ),
            }
        )

    ds = docs_ds.map_batches(to_payload, batch_format="pyarrow")
    thumbs = ds.map_batches(
        ImageResizeStub, fn_constructor_kwargs=dict(target=4),
        batch_format="pyarrow", batch_size=4, concurrency=(1, 2),
    ).take_all()
    assert all(len(r["thumbnail"]) == 16 for r in thumbs)
    # determinism: identical payloads -> identical thumbnails
    by_id = {r["doc_id"]: r["thumbnail"] for r in thumbs}
    assert by_id[0] == by_id[1]

    frames = ds.map_batches(
        FrameSampleStub, batch_format="pyarrow", batch_size=4,
        concurrency=(1, 2),
    ).take_all()
    f0 = {r["doc_id"]: r["frames"] for r in frames}
    assert len(f0[0]) >= 1 and all(len(fr) <= 64 for fr in f0[0])


def test_multimodal_strict_pure_codec():
    """The strict path must run END-TO-END in this dependency-free
    environment: real PNG bytes through decode/resize/feature, real Y4M
    bytes through frame sampling (round-4 verdict: 'make multimodal
    decode real without optional deps')."""
    import numpy as np

    from elasticsearch_ray.functions import imagecodec
    from elasticsearch_ray.ops.multimodal import (
        BinaryFeatureExtractor,
        FrameSample,
        ImageDecodeMeta,
        ImageResize,
    )

    img = (np.arange(24 * 17, dtype=np.int64) % 251).astype(np.uint8)
    img = img.reshape(24, 17)
    payload = imagecodec.png_encode(img, filters=None)  # every filter type
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "payload": pa.array([payload], pa.binary())})
    meta = ImageDecodeMeta()(tbl)
    assert meta.column("width")[0].as_py() == 17
    assert meta.column("height")[0].as_py() == 24
    exp_mean = int(np.floor(img.astype(np.int64).mean() * 1e6 + 0.5))
    assert meta.column("mean_luma_u")[0].as_py() == exp_mean

    rz = ImageResize(mode="strict", target=4)
    thumb = rz(tbl).column("thumbnail")[0].as_py()
    assert len(thumb) == 16
    fx = BinaryFeatureExtractor(mode="strict")
    fo = fx(tbl)
    assert fo.column("payload_bytes")[0].as_py() == len(payload)
    assert len(fo.column("feature")[0].as_py()) == 16

    # video: a real YUV4MPEG2 stream, strict frame sampling
    frames = np.stack(
        [np.full((6, 8), i * 10, dtype=np.uint8) for i in range(9)]
    )
    vid = imagecodec.y4m_encode(frames, chroma="420")
    vtbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "payload": pa.array([vid], pa.binary())})
    fs = FrameSample(mode="strict", stride=4, max_frames=8)
    out = fs(vtbl)
    got = out.column("frames")[0].as_py()
    assert out.column("frame_width")[0].as_py() == 8
    assert out.column("frame_height")[0].as_py() == 6
    assert out.column("total_frames")[0].as_py() == 9
    # frames 0, 4, 8 sampled; luma bytes round-trip exactly
    assert [f[0] for f in got] == [0, 40, 80]
    assert all(len(f) == 48 for f in got)


def test_multimodal_strict_pil_decode():
    """Real-codec path (runs only where Pillow is installed): strict mode
    decodes actual image bytes and resizes/extracts without the fake
    byte-histogram fallback."""
    import pytest as _pytest

    from elasticsearch_ray.ops.multimodal import (
        BinaryFeatureExtractor,
        ImageResizeStub,
        _try_import_pil,
    )

    Image = _try_import_pil()
    if Image is None:
        _pytest.skip("Pillow not installed in this environment")
    import io

    import numpy as np

    img = Image.fromarray(
        (np.arange(32 * 32, dtype=np.uint16) % 256).astype(np.uint8).reshape(32, 32)
    )
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "payload": pa.array([payload], pa.binary())})
    rz = ImageResizeStub(mode="strict", target=4)
    out = rz(tbl)
    assert len(out.column("thumbnail")[0].as_py()) == 16
    fx = BinaryFeatureExtractor(mode="strict")
    fo = fx(tbl)
    assert fo.column("payload_bytes")[0].as_py() == len(payload)
    assert len(fo.column("feature")[0].as_py()) == 16


def test_lsh_candidate_pairs_and_shingles(docs_ds):
    from elasticsearch_ray.ops.dedup import lsh_candidate_pairs, shingle_rows

    pairs = {(r["a"], r["b"]) for r in lsh_candidate_pairs(docs_ds).take_all()}
    # exact dups of doc 0 must be candidates of rep 0; a != b everywhere
    assert (0, 1) in pairs and (0, 5) in pairs
    assert all(a != b for a, b in pairs)

    sh = {}
    for r in shingle_rows(docs_ds).take_all():
        sh.setdefault(r["doc_id"], set()).add(r["sh"])
    assert 7 not in sh  # empty doc emits no shingle rows
    assert sh[0] == sh[1] == sh[5]  # identical texts -> identical sets
    ja = len(sh[0] & sh[2]) / len(sh[0] | sh[2])
    assert 0.0 < ja < 1.0  # near-dup overlaps but differs


def test_curate_broadcast_matches_join_fallback(docs_ds):
    """The size-aware broadcast path and the join fallback must make the
    same keep decisions and report the same stage counts."""
    from elasticsearch_ray.ops.curation import curate

    kw = dict(min_quality=0.0, min_words=2, near_dedup=True, num_partitions=2)
    bres = curate(docs_ds, **kw)  # small drop sets -> broadcast path
    jres = curate(docs_ds, broadcast_max_rows=0, **kw)  # forced join path
    bids = sorted(r["doc_id"] for r in bres["kept_ds"].take_all())
    jids = sorted(r["doc_id"] for r in jres["kept_ds"].take_all())
    assert bids == jids
    for k in ("total", "after_quality", "exact_dedup_reps",
              "near_dups_dropped", "kept"):
        assert bres[k] == jres[k], k


def test_exact_dup_groups(docs_ds):
    from elasticsearch_ray.ops.dedup import exact_dup_groups

    rows = exact_dup_groups(docs_ds).take_all()
    # only ONE content value is duplicated (docs 0,1,5)
    assert len(rows) == 1
    assert rows[0]["rep"] == 0 and rows[0]["dupes"] == 3


def test_curate_resumable(docs_ds, tmp_path):
    """Shard-resumable curate: same keep set as curate(); a rerun skips
    finished shards; a shard with a missing marker is redone."""
    import json
    import os
    import time

    from elasticsearch_ray.ops.curation import curate, curate_resumable

    src = str(tmp_path / "src")
    docs_ds.repartition(4).write_parquet(src)
    out = str(tmp_path / "cur_resume")
    kw = dict(min_quality=0.0, min_words=2, near_dedup=True)
    res = curate_resumable(src, out, files_per_shard=1, **kw)
    assert res["shards"] >= 2 and res["shards_redone"] == res["shards"]
    ids1 = sorted(r["doc_id"] for r in res["kept_ds"].take_all())

    ref = curate(docs_ds, **kw)
    assert ids1 == sorted(r["doc_id"] for r in ref["kept_ds"].take_all())
    for k in ("total", "after_quality", "exact_dedup_reps",
              "near_dups_dropped", "kept"):
        assert res[k] == ref[k], k

    # resume: all shards marked -> nothing redone, counts identical
    res2 = curate_resumable(src, out, files_per_shard=1, **kw)
    assert res2["shards_redone"] == 0 and res2["kept"] == res["kept"]

    # knock out one shard's marker -> exactly that shard is redone
    victim = os.path.join(out, "shard=00001", "_done.json")
    os.remove(victim)
    res3 = curate_resumable(src, out, files_per_shard=1, **kw)
    assert res3["shards_redone"] == 1 and res3["kept"] == res["kept"]
    assert json.load(open(victim))["kept"] >= 0
    assert sorted(
        r["doc_id"] for r in res3["kept_ds"].take_all()
    ) == ids1


def test_curation_pipeline(docs_ds, tmp_path):
    from elasticsearch_ray.ops.curation import curate

    res = curate(
        docs_ds, min_quality=0.0, min_words=2, near_dedup=True,
        out_dir=str(tmp_path / "curated"), num_partitions=2,
    )
    kept_ids = {r["doc_id"] for r in res["kept_ds"].take_all()}
    assert res["total"] == 8
    # exact dups 1, 5 collapse into 0's group; empty doc and 'short text'
    # fail min_words=2? 'short text' has 2 words -> kept
    assert 1 not in kept_ids and 5 not in kept_ids
    assert 7 not in kept_ids  # empty doc
    assert 0 in kept_ids and 3 in kept_ids
    # near-dup doc 2 dropped by minhash against doc 0? may or may not bucket;
    # at minimum the counts are consistent
    assert res["kept"] == len(kept_ids) <= res["exact_dedup_reps"]
    import os
    out = str(tmp_path / "curated")
    assert any(f.endswith(".parquet") for f in os.listdir(out))


def test_corpus_bigrams_randomized():
    """bigram_counts vs a pure-python Counter over str.split(' ') pairs."""
    import random
    from collections import Counter

    from elasticsearch_ray.ops.corpus import bigram_counts

    rng = random.Random(5)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        for _ in range(200)
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    exp = Counter()
    for t in texts:
        parts = t.split(" ")
        for a, b in zip(parts, parts[1:]):
            exp[f"{a} {b}"] += 1
    top = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r["bigram"], r["n"]) for r in bigram_counts(ds, top_k=10).take_all()]
    assert got == top


def test_corpus_source_quota_randomized():
    """source_quota vs a pure-python per-key top-N."""
    import random

    from elasticsearch_ray.ops.corpus import source_quota

    rng = random.Random(9)
    rows = [
        {"doc_id": i, "source": f"s{rng.randint(0, 7)}",
         "n_chars": rng.randint(0, 50)}
        for i in range(300)
    ]
    ds = ray.data.from_arrow(
        pa.table({k: pa.array([r[k] for r in rows]) for k in rows[0]})
    )
    exp = set()
    bykey: dict = {}
    for r in rows:
        bykey.setdefault(r["source"], []).append(r)
    for k, rs in bykey.items():
        rs.sort(key=lambda r: (-r["n_chars"], r["doc_id"]))
        exp.update(r["doc_id"] for r in rs[:4])
    got = {r["doc_id"] for r in source_quota(ds, n_per_key=4).take_all()}
    assert got == exp


def test_corpus_hash_split_deterministic():
    """hash_split is content-keyed: identical across row orders; buckets
    match hashlib.md5 exactly."""
    import hashlib

    from elasticsearch_ray.ops.corpus import hash_split

    texts = [f"document number {i} with content" for i in range(100)]
    tbl = pa.table({"doc_id": pa.array(range(100), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out1 = {r["doc_id"]: (r["split"], r["bucket"])
            for r in hash_split(ray.data.from_arrow(tbl)).take_all()}
    shuffled = tbl.take(pa.array(list(reversed(range(100)))))
    out2 = {r["doc_id"]: (r["split"], r["bucket"])
            for r in hash_split(ray.data.from_arrow(shuffled)).take_all()}
    assert out1 == out2
    for i, t in enumerate(texts):
        b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 1000
        assert out1[i][1] == b


def test_percolate_matches_oracle():
    """Stream percolation (ES percolator as map_batches) vs the oracle's
    per-query hit sets over the same corpus — match and boolean queries,
    including NOT complements and malformed queries."""
    import random

    from elasticsearch_ray.ops.percolate import percolate
    from elasticsearch_ray.oracle.oracle import OracleIndex

    rng = random.Random(43)
    vocab = ["merge", "hash", "scan", "join", "other", "words"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 9)))
        for _ in range(120)
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)
    queries = [
        "merge",                   # match single term
        "merge hash",              # match-any
        "merge AND hash",          # boolean
        "scan OR (join AND NOT merge)",
        "words NOT merge",         # implicit-AND + complement
        "AND AND",                 # malformed -> no matches
    ]
    oracle = OracleIndex()
    from elasticsearch_ray.normalizer import make_normalizer

    oracle.normalizer = make_normalizer("plain")
    oracle.build(list(enumerate(texts)))
    got = sorted(
        (r["doc_id"], r["query_id"])
        for r in percolate(ds, queries, analyzer="plain").take_all()
    )
    from elasticsearch_ray.oracle.oracle import looks_boolean

    exp = []
    for qid, q in enumerate(queries):
        if looks_boolean(q):  # same routing as the percolator/engine
            hits = {
                r["doc_id"]
                for r in oracle.query_boolean(q, size=10_000)["results"]
            }
        else:
            terms = oracle.normalizer.preprocess_query_list(q)
            hits = {
                d for t in terms
                for d in oracle.inverted_index.get(t, [])
            }
        exp.extend((d, qid) for d in hits)
    assert got == sorted(exp)


def test_dup_clusters_connected_components():
    """Distributed min-label propagation over the verified near-dup graph
    vs a python union-find over the same edges."""
    import random

    from elasticsearch_ray.ops.dedup import dup_clusters, verified_dup_edges

    rng = random.Random(73)
    # build clusters of near-identical docs: k families, each with several
    # variants sharing most shingles, plus unrelated singletons
    fams = []
    texts = []
    for f in range(6):
        base = [f"w{f}_{i}" for i in range(30)]
        size = rng.randint(2, 5)
        fam = []
        for v in range(size):
            t = list(base)
            t[rng.randrange(len(t))] = f"v{f}_{v}"
            fam.append(len(texts))
            texts.append(" ".join(t))
        fams.append(fam)
    for s in range(10):  # singletons
        texts.append(" ".join(f"s{s}_{i}" for i in range(20)))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(4)
    edges_ds = verified_dup_edges(ds, threshold=0.5, num_partitions=4)
    edges = [(r["a"], r["b"]) for r in edges_ds.take_all()]
    assert edges, "expected near-dup edges"
    # python union-find ground truth over the same edge list
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {n: find(n) for n in parent}
    got = {
        r["doc_id"]: r["cluster"]
        for r in dup_clusters(ds, threshold=0.5, num_partitions=4).take_all()
    }
    assert got == exp
    # driver_edge_limit=0 forces the distributed label-propagation path;
    # both paths must emit identical labels
    got_dist = {
        r["doc_id"]: r["cluster"]
        for r in dup_clusters(
            ds, threshold=0.5, num_partitions=4, driver_edge_limit=0
        ).take_all()
    }
    assert got_dist == exp
    # each family is one component labeled by its min doc id
    for fam in fams:
        labels = {got.get(d) for d in fam if d in got}
        if len([d for d in fam if d in got]) > 1:
            assert len(labels) == 1


def test_verified_dup_edges_paths_identical():
    """The three verification tiers — driver sorted-array intersect,
    filtered join path, unfiltered join path — must emit identical
    edges."""
    import random

    from elasticsearch_ray.ops.dedup import verified_dup_edges

    rng = random.Random(19)
    texts = []
    for f in range(4):
        base = [f"t{f}_{i}" for i in range(25)]
        for v in range(3):
            t = list(base)
            t[rng.randrange(len(t))] = f"x{f}_{v}"
            texts.append(" ".join(t))
    texts.append("")  # tokenless doc: must be dropped by every path
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)

    def edges(**kw):
        df = verified_dup_edges(
            ds, threshold=0.5, num_partitions=4, **kw
        ).to_pandas()
        return sorted(map(tuple, df[["a", "b"]].to_numpy()))

    fast = edges()
    join_filtered = edges(driver_shingle_limit=0)
    join_unfiltered = edges(driver_pair_limit=0)
    assert fast, "expected near-dup edges"
    assert fast == join_filtered == join_unfiltered


def test_lsh_driver_and_distributed_resolve_identical():
    """minhash_lsh_dedup and lsh_candidate_pairs run the same bucket
    kernel either once driver-side (small band table) or per coarse hash
    partition (scale path, driver_band_limit=0) — outputs must match."""
    import random

    from elasticsearch_ray.ops.dedup import lsh_candidate_pairs, minhash_lsh_dedup

    rng = random.Random(11)
    texts = []
    for f in range(5):
        base = [f"q{f}_{i}" for i in range(25)]
        for v in range(3):
            t = list(base)
            t[rng.randrange(len(t))] = f"y{f}_{v}"
            texts.append(" ".join(t))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    dups = lambda **kw: sorted(
        r["doc_id"] for r in minhash_lsh_dedup(ds, **kw).take_all()
    )
    assert dups() == dups(driver_band_limit=0)
    assert dups(verify_jaccard=0.5) == dups(
        verify_jaccard=0.5, driver_band_limit=0
    )
    pairs = lambda **kw: sorted(
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(ds, num_partitions=4, **kw).take_all()
    )
    got = pairs()
    assert got and got == pairs(driver_band_limit=0)

    from elasticsearch_ray.ops.dedup import simhash_dedup

    sim = lambda **kw: sorted(
        (r["doc_id"], r["near_of"])
        for r in simhash_dedup(ds, max_hamming=8, **kw).take_all()
    )
    assert sim() == sim(driver_band_limit=0)


def test_shingle_hashes_gram_semantics():
    """The vectorized FNV-fold shingle ids must respect gram-string
    semantics: identical k-token windows hash equal, Jaccard over hash
    sets equals Jaccard over gram-string sets on random corpora."""
    import random

    import numpy as np

    from elasticsearch_ray.ops.dedup import _shingle_hashes, ngram_jaccard

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(50):
        a = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(0, 30))]
        b = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(0, 30))]
        ha, hb = _shingle_hashes(a, 3), _shingle_hashes(b, 3)
        # permutation-invariance of sets + window equality
        sa, sb = set(ha.tolist()), set(hb.tolist())
        if a and b:
            inter = len(sa & sb)
            jh = inter / (len(sa) + len(sb) - inter)
            assert abs(jh - ngram_jaccard(a, b)) < 1e-12, (a, b)
        if a:
            # same window sequence => identical ids, in order
            assert np.array_equal(ha, _shingle_hashes(list(a), 3))
    assert _shingle_hashes([], 3).size == 0
    # short doc (< k tokens) folds to exactly one gram
    assert _shingle_hashes(["one", "two"], 3).size == 1


def test_pack_manifest_matches_python_scan():
    """Distributed prefix-scan sequence packing vs a sequential python
    pack: offsets, sequence spans, and zero-token handling — across
    bucket boundaries and multiple partitions."""
    import random

    from elasticsearch_ray.ops.packing import pack_manifest

    rng = random.Random(79)
    texts = []
    for i in range(300):
        if i % 17 == 0:
            texts.append("")  # zero-token docs
        elif i % 23 == 0:
            texts.append("   ")  # whitespace-only
        else:
            texts.append(
                " ".join(f"t{j}" for j in range(rng.randint(1, 40)))
            )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(5)
    L = 64
    got = {
        r["doc_id"]: (r["n_tok"], r["tok_start"], r["seq_start"],
                      r["seq_end"])
        for r in pack_manifest(
            ds, L, bucket_rows=50, num_partitions=4
        ).take_all()
    }
    off = 0
    for i, t in enumerate(texts):
        n = len(t.split())
        exp = (
            n, off,
            off // L if n else -1,
            (off + n - 1) // L if n else -1,
        )
        assert got[i] == exp, (i, got[i], exp)
        off += n
    assert len(got) == len(texts)


def test_curate_resumable_dup_free_corpus(tmp_path):
    """A corpus with NO exact or near duplicates: the persisted drop sets
    are empty (zero parquet files) — resume must read them as empty, not
    crash (regression: write_parquet of an empty Dataset writes nothing)."""
    import pyarrow.parquet as pq

    from elasticsearch_ray.ops.curation import curate_resumable

    texts = [
        " ".join(f"unique{i}_{j} word{j} thing{i}" for j in range(12))
        for i in range(30)
    ]
    src = tmp_path / "src"; src.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(src / "p.parquet"),
    )
    out = str(tmp_path / "out")
    res = curate_resumable(str(src), out, near_dedup=True)
    assert res["kept"] == len(texts)
    assert res["near_dups_dropped"] == 0
    # resume path: state reloads (empty sets), shards skip
    res2 = curate_resumable(str(src), out, near_dedup=True)
    assert res2["kept"] == len(texts)
    assert res2["shards_redone"] == 0


def test_percolate_phrase_queries():
    """Percolation of quoted-phrase (and sloppy-phrase) registered queries
    vs the positions-enabled oracle's phrase evaluation."""
    from elasticsearch_ray.normalizer import make_normalizer
    from elasticsearch_ray.ops.percolate import percolate
    from elasticsearch_ray.oracle.oracle import OracleIndex

    texts = [
        "machine learning models train on big data",
        "learning machine is reversed here",
        "big data processing with machine learning pipelines",
        "data big reversed order",
        "machine separated by stuff from learning",
        "unrelated cooking recipes",
        "machine then one gap learning follows",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    queries = [
        '"machine learning"',
        '"machine learning"~3',
        '"big data" processing',
        '"learning machine"',
        '"machine learning" "big data"',
    ]
    oracle = OracleIndex(store_positions=True)
    oracle.normalizer = make_normalizer("plain")
    oracle.build(list(enumerate(texts)))
    got: dict = {}
    for r in percolate(ds, queries, analyzer="plain").take_all():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    for qid, q in enumerate(queries):
        exp = {
            r["doc_id"]
            for r in oracle.query_phrase(q, size=1000)["results"]
        }
        assert got.get(qid, set()) == exp, (q, got.get(qid), exp)


def test_image_resize_strict_tolerates_null_payloads():
    """strict mode must not kill the whole map_batches task over a
    null/empty payload row (fake mode tolerates these): such rows emit a
    zero placeholder thumbnail; only non-empty bytes reach the codec."""
    from elasticsearch_ray.ops.multimodal import ImageResizeStub

    stage = ImageResizeStub(target=4, mode="fake")

    class _Boom:  # stands in for PIL.Image: must never see a null payload
        @staticmethod
        def open(buf):
            raise AssertionError("codec called with null/empty payload")

    stage._Image = _Boom
    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([None, b""], pa.binary()),
    })
    out = stage(batch)
    assert out.column("thumbnail").to_pylist() == [bytes(16), bytes(16)]


def test_composite_buckets_pagination(docs_ds):
    """Composite-agg pages: strict key order, disjoint, after-key
    resumes exactly, concatenated pages == the full group-by."""
    import ray.data

    from elasticsearch_ray.ops.corpus import composite_buckets

    # enrich with a second key so composites are non-trivial
    def add_src(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        t = t.append_column(
            "source", pa.array([f"s{int(i) % 3}" for i in ids], pa.string())
        )
        return t.append_column(
            "lang", pa.array([f"l{int(i) % 2}" for i in ids], pa.string())
        )

    ds = docs_ds.map_batches(add_src, batch_format="pyarrow")
    full, after0 = composite_buckets(
        ds, keys=["source", "lang"], size=10_000
    )
    assert after0 is None
    keys_full = list(zip(full.column("source").to_pylist(),
                         full.column("lang").to_pylist()))
    assert keys_full == sorted(keys_full)  # strict key order
    pages, after, seen = [], None, []
    while True:
        page, after = composite_buckets(
            ds, keys=["source", "lang"], size=2, after=after
        )
        pages.append(page)
        seen += list(zip(page.column("source").to_pylist(),
                         page.column("lang").to_pylist()))
        if after is None:
            break
    assert seen == keys_full  # disjoint, ordered, complete
    got = pa.concat_tables(pages)
    assert got.column("doc_count").to_pylist() == \
        full.column("doc_count").to_pylist()


def test_repetition_stats_vs_python():
    """Gopher-style repetition signals: the vectorized dictionary-encode /
    run-length kernel matches a per-doc python Counter oracle, including
    the no-bigram and repeated-token edges."""
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from elasticsearch_ray.ops.textstats import repetition_stats

    import random
    rng = random.Random(3)
    vocab = ["a", "b", "c", "dd", "e"]
    texts = ["a b a b a b", "x", "q q q q", "x y z"] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30)))
        for _ in range(60)
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {r["doc_id"]: r for r in repetition_stats(ds).take_all()}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n = len(toks)
        bgs = Counter(zip(toks, toks[1:]))
        mb = max(bgs.values()) if bgs else 0
        nb = max(sum(bgs.values()), 1)
        assert got[i]["n_tokens"] == n
        assert got[i]["distinct_ratio_u"] == math.floor(
            len(set(toks)) / n * 1e6 + 0.5
        )
        assert got[i]["top_bigram_frac_u"] == math.floor(mb / nb * 1e6 + 0.5)


def test_pii_scrub_patterns():
    """Vectorized PII redaction: emails, IPv4, phone variants; counts per
    doc; nulls tolerated; non-PII text untouched byte-for-byte."""
    import ray.data as rd

    from elasticsearch_ray.ops.scrub import pii_scrub

    texts = [
        "mail john.doe+x@sub.example.co.uk now",
        "hosts 10.0.255.3 and 192.168.1.77",
        "call +44 20 7946 0958 or +15551234567",
        "plain text, 1.2 not an ip, a@b not an email",
        None,
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    out = {r["doc_id"]: r for r in pii_scrub(ds).take_all()}
    assert out[0]["text"] == "mail <EMAIL> now"
    assert out[0]["pii_hits"] == 1
    assert out[1]["text"] == "hosts <IP> and <IP>"
    assert out[1]["pii_hits"] == 2
    assert out[2]["text"] == "call <PHONE> or <PHONE>"
    assert out[2]["pii_hits"] == 2
    assert out[3]["text"] == texts[3]
    assert out[3]["pii_hits"] == 0
    assert out[4]["text"] == "" and out[4]["pii_hits"] == 0


def test_decontaminate_vs_python_reference():
    """The vectorized shingle-hash membership must agree with a plain
    Python n-gram set intersection on a randomized corpus (boundary
    cases: shingles never cross documents, casing/punctuation
    normalization, short docs)."""
    import random
    import re

    import ray.data as rd

    from elasticsearch_ray.ops.scrub import decontaminate

    rng = random.Random(19)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(60):
        k = rng.randint(2, 20)
        words = [rng.choice(vocab) for _ in range(k)]
        # random punctuation/casing noise the normalization must erase
        docs.append(" ".join(
            w.upper() + rng.choice(["", ",", "!", "..."]) for w in words
        ))
    evals = [docs[7], docs[23], "W3 w11! w3 W7 w1"]
    n = 4

    def norm(t):
        return re.findall(r"[a-z0-9]+", t.lower())

    eval_shingles = set()
    for t in evals:
        ts = norm(t)
        for j in range(len(ts) - n + 1):
            eval_shingles.add(tuple(ts[j : j + n]))

    expect_bad = set()
    for i, t in enumerate(docs):
        ts = norm(t)
        if any(
            tuple(ts[j : j + n]) in eval_shingles
            for j in range(len(ts) - n + 1)
        ):
            expect_bad.add(i)

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    marked = decontaminate(ds, evals, n=n, keep_clean_only=False).take_all()
    got_bad = {r["doc_id"] for r in marked if r["contaminated"]}
    assert got_bad == expect_bad
    kept = decontaminate(ds, evals, n=n).take_all()
    assert {r["doc_id"] for r in kept} == set(range(len(docs))) - expect_bad


def test_pipeline_aggs_semantics():
    """ES pipeline aggregations over a bucket table: derivative (first
    bucket null), cumulative_sum, moving_fn windows with ES shift
    semantics (shift=0 excludes the current bucket), bucket_sort
    (stable multi-key, from/size), sibling stats."""
    from elasticsearch_ray.ops.pipeline_aggs import (
        bucket_sort,
        cumulative_sum,
        derivative,
        moving_avg,
        sibling_stats,
    )

    b = pa.table({
        "key": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "m": pa.array([10, 4, 4, 7, 1], pa.int64()),
    })
    d = derivative(b, "m").column("m_deriv").to_pylist()
    assert d == [None, -6.0, 0.0, 3.0, -6.0]
    c = cumulative_sum(b, "m").column("m_cumsum").to_pylist()
    assert c == [10, 14, 18, 25, 26]
    # shift=0: window is the trailing `window` buckets EXCLUDING current
    m0 = moving_avg(b, "m", window=2, shift=0).column("m_movavg").to_pylist()
    assert m0 == [None, 10.0, 7.0, 4.0, 5.5]
    # shift=1 includes the current bucket
    m1 = moving_avg(b, "m", window=2, shift=1).column("m_movavg").to_pylist()
    assert m1 == [10.0, 7.0, 4.0, 5.5, 4.0]
    # bucket_sort: desc by m, stable on the tie (keys 1 then 2), from/size
    s = bucket_sort(b, [("m", "desc")])
    assert s.column("key").to_pylist() == [0, 3, 1, 2, 4]
    s2 = bucket_sort(b, [("m", "desc")], from_=1, size=2)
    assert s2.column("key").to_pylist() == [3, 1]
    # multi-key: m asc then key desc within equal m
    s3 = bucket_sort(b, [("m", "asc"), ("key", "desc")])
    assert s3.column("key").to_pylist() == [4, 2, 1, 3, 0]
    st = sibling_stats(b, "m")
    assert st == {"count": 5, "min": 1.0, "max": 10.0, "avg": 5.2,
                  "sum": 26.0}
    assert sibling_stats(b.slice(0, 0), "m")["count"] == 0

    from elasticsearch_ray.ops.pipeline_aggs import (
        bucket_script,
        bucket_selector,
        serial_diff,
    )

    # serial_diff: first `lag` buckets null, then m[i]-m[i-lag]
    sd = serial_diff(b, "m", lag=2).column("m_diff_2").to_pylist()
    assert sd == [None, None, -6.0, 3.0, -3.0]
    with pytest.raises(ValueError):
        serial_diff(b, "m", lag=0)
    # lag >= len → all null
    assert serial_diff(b, "m", lag=9).column("m_diff_9").to_pylist() == \
        [None] * 5
    # bucket_script: vectorized painless stand-in
    bs = bucket_script(b, {"x": "m", "k": "key"},
                       lambda x, k: x * 2 + k, out_col="v")
    assert bs.column("v").to_pylist() == [20.0, 9.0, 10.0, 17.0, 6.0]
    with pytest.raises(ValueError):
        bucket_script(b, {"x": "m"}, lambda x: x[:2], out_col="v")
    # bucket_selector: keep buckets passing the predicate
    sel = bucket_selector(b, {"x": "m"}, lambda x: x >= 5)
    assert sel.column("key").to_pylist() == [0, 3]


def test_scrub_rerun_and_empty_pipeline_aggs():
    """Review regressions: (a) re-running pii_scrub / decontaminate on
    their own output must not create duplicate-named columns; (b)
    pipeline aggs over ZERO buckets (a histogram matching no docs)
    return the empty table with the output column, not IndexError."""
    import ray.data as rd

    from elasticsearch_ray.ops.pipeline_aggs import (
        cumulative_sum,
        derivative,
        moving_avg,
    )
    from elasticsearch_ray.ops.scrub import decontaminate, pii_scrub

    ds = rd.from_arrow(pa.table({
        "text": pa.array(["write a@b.com twice", "clean"], pa.string()),
    }))
    twice = pii_scrub(pii_scrub(ds)).take_all()
    assert sorted(twice[0].keys()) == ["pii_hits", "text"]
    assert twice[0]["text"] == "write <EMAIL> twice"
    assert twice[0]["pii_hits"] == 0  # already redacted on pass 1

    evals = ["alpha beta gamma delta"]
    corpus = rd.from_arrow(pa.table({
        "text": pa.array(["alpha beta gamma delta epsilon", "unrelated"]),
    }))
    d2 = decontaminate(
        decontaminate(corpus, evals, n=4, keep_clean_only=False),
        evals, n=4, keep_clean_only=False,
    ).take_all()
    assert sorted(d2[0].keys()) == ["contaminated", "overlap_ngrams", "text"]
    assert [r["contaminated"] for r in d2] == [True, False]

    empty = pa.table({"m": pa.array([], pa.float64())})
    for fn in (lambda t: derivative(t, "m"),
               lambda t: cumulative_sum(t, "m"),
               lambda t: moving_avg(t, "m", window=3)):
        out = fn(empty)
        assert out.num_rows == 0 and len(out.column_names) == 2


def test_image_decode_meta_null_payload():
    """ImageDecodeMeta strict decode must not kill the whole batch over
    a missing payload: null/empty bytes become a zero-size row, real
    payloads still decode."""
    import numpy as np

    from elasticsearch_ray.functions import imagecodec as ic
    from elasticsearch_ray.ops.multimodal import ImageDecodeMeta

    png = ic.png_encode(np.full((2, 2), 9, np.uint8))
    batch = pa.table({
        "payload": pa.array([None, b"", png], pa.binary()),
        "k": pa.array([1, 2, 3], pa.int64()),
    })
    out = ImageDecodeMeta()(batch)
    assert out.column("width").to_pylist() == [0, 0, 2]
    assert out.column("height").to_pylist() == [0, 0, 2]
    assert out.column("mean_luma_u").to_pylist()[2] == 9_000_000


def test_categorize_text():
    import ray.data

    from elasticsearch_ray.ops.textstats import categorize_text

    texts = [
        "error in module 42 retry",
        "error in module 7 retry",
        "warn disk full",
        "error out of memory now",
        "error out of memory",
        "x1 y2 z3",          # every token numeric-ish -> empty category
        "",                   # empty doc -> empty category
    ]
    ds = ray.data.from_items([{"text": t} for t in texts])
    out = categorize_text(ds, max_tokens=3, size=10)

    # python oracle: first 3 digit-free tokens
    from collections import Counter
    want = Counter(
        " ".join([w for w in t.split() if not any(c.isdigit() for c in w)][:3])
        for t in texts
    )
    exp = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [(b["key"], b["doc_count"]) for b in out] == exp
    assert {"key": "error in module", "doc_count": 2} in out
    assert {"key": "error out of", "doc_count": 2} in out
    # numeric-only and empty docs share the '' category
    assert {"key": "", "doc_count": 2} in out
    import pytest as _pt
    with _pt.raises(ValueError):
        categorize_text(ds, max_tokens=0)


def test_frequent_item_sets_randomized():
    """frequent_item_sets vs a pure-python apriori over doc token sets
    (same top-M candidate universe, same tie-breaks)."""
    import itertools
    import random
    from collections import Counter

    import ray.data

    from elasticsearch_ray.ops.corpus import frequent_item_sets

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(12)]
    docs = [" ".join(rng.choice(vocab)
                     for _ in range(rng.randint(1, 14)))
            for _ in range(120)]

    def brute(top_items, min_support, size):
        df = Counter()
        for t in docs:
            df.update(set(t.split(" ")))
        items = [w for w, _ in sorted(df.items(),
                                      key=lambda kv: (-kv[1], kv[0]))
                 [:top_items]]
        iset = set(items)
        sup = Counter()
        for t in docs:
            present = sorted(set(t.split(" ")) & iset)
            for a, b in itertools.combinations(present, 2):
                sup[(a, b)] += 1
        out = [{"item_a": a, "item_b": b, "support": s}
               for (a, b), s in sup.items() if s >= min_support]
        out.sort(key=lambda d: (-d["support"], d["item_a"], d["item_b"]))
        return out[:size]

    ds = ray.data.from_items([{"text": t} for t in docs])
    for top_items, min_support, size in ((5, 2, 10), (12, 10, 20),
                                         (8, 1, 50)):
        got = frequent_item_sets(ds, top_items=top_items,
                                 min_support=min_support, size=size)
        assert got == brute(top_items, min_support, size), \
            (top_items, min_support, size)
    import pytest as _pt
    with _pt.raises(ValueError):
        frequent_item_sets(ds, top_items=1)


def test_remove_dup_spans_randomized():
    """remove_dup_spans vs a pure-python oracle (duplicated n-gram
    windows across >= 2 distinct docs, interval union, token excision)."""
    import random

    import ray.data

    from elasticsearch_ray.ops.dedup import remove_dup_spans

    rng = random.Random(61)
    vocab = [f"w{i}" for i in range(10)]
    docs = [" ".join(rng.choice(vocab) for _ in range(rng.randint(2, 25)))
            for _ in range(60)]
    # plant an exact shared phrase in several docs
    phrase = "p1 p2 p3 p4 p5"
    for i in (3, 17, 41):
        docs[i] = docs[i] + " " + phrase
    n = 4

    def brute():
        grams = {}
        toks = [d.split() for d in docs]
        for di, t in enumerate(toks):
            for p in range(len(t) - n + 1):
                grams.setdefault(tuple(t[p:p + n]), set()).add(di)
        out = []
        for di, t in enumerate(toks):
            covered = [False] * len(t)
            for p in range(len(t) - n + 1):
                if len(grams[tuple(t[p:p + n])]) >= 2:
                    for j in range(p, min(p + n, len(t))):
                        covered[j] = True
            kept = [w for w, c in zip(t, covered) if not c]
            out.append({"doc_id": di, "clean_text": " ".join(kept),
                        "removed_tokens": sum(covered)})
        return out

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    )
    got = sorted(remove_dup_spans(ds, n=n, num_partitions=8).take_all(),
                 key=lambda r: r["doc_id"])
    got = [dict(r) for r in got]
    assert got == brute()
    # planted phrase removed everywhere
    for i in (3, 17, 41):
        assert "p1" not in got[i]["clean_text"]
    import pytest as _pt
    with _pt.raises(ValueError):
        remove_dup_spans(ds, n=1)


def test_ann_ivfpq(emb_ds, tmp_path):
    """IVF-PQ: codes reconstruct enough signal that ADC top-k overlaps
    brute force; build is deterministic; probing every bucket with
    pq_k >= corpus size ranks the quantized vectors exactly."""
    import shutil

    from elasticsearch_ray.ops.ann import (
        brute_force_topk, ivfpq_build, ivfpq_query, pq_encode, pq_train,
    )

    ds, vecs = emb_ds
    d = str(tmp_path / "ivfpq")
    meta = ivfpq_build(ds, d, n_clusters=4, m=4, pq_k=40,
                       sample_size=1000)
    assert meta["pq_k"] == 40 and meta["m"] == 4
    q = vecs[:3].astype(np.float64)
    bf = brute_force_topk(ds, q, k=5)
    res = ivfpq_query(d, q, k=5, nprobe=4)  # probe all buckets
    hits = 0
    for qi in range(3):
        b = set(bf.filter(pa.compute.equal(bf.column("query_id"), qi))
                .column("vec_id").to_pylist())
        hits += len(b & set(res[qi]["ids"]))
    # every vector is its own PQ codeword candidate here (pq_k = n),
    # so quantization is near-lossless and recall@5 should be high
    assert hits >= 12, hits
    # determinism: rebuild -> identical results
    d2 = str(tmp_path / "ivfpq2")
    ivfpq_build(ds, d2, n_clusters=4, m=4, pq_k=40, sample_size=1000)
    assert ivfpq_query(d2, q, k=5, nprobe=4) == res
    # encode determinism + shape
    books = np.load(f"{d}/codebooks.npy")
    codes = pq_encode(vecs.astype(np.float32), books)
    assert codes.shape == (40, 4) and codes.dtype == np.uint8
    # low nprobe: a query's own bucket is always probed first
    res1 = ivfpq_query(d, q, k=5, nprobe=1)
    for qi in range(3):
        assert qi in res1[qi]["ids"]
    import pytest as _pt
    with _pt.raises(ValueError):
        pq_train(vecs.astype(np.float32), m=3)  # 8 % 3 != 0
    shutil.rmtree(d)


def test_lm_perplexity_randomized():
    """lm_perplexity vs a pure-python bigram-LM oracle, including the
    top_vocab pruning (OOV tokens), empty docs, and 1-token docs."""
    import math
    import random
    from collections import Counter

    import ray.data

    from elasticsearch_ray.ops.corpus import lm_perplexity

    rng = random.Random(77)
    vocab = [f"w{i}" for i in range(9)]
    docs = [" ".join(rng.choice(vocab)
                     for _ in range(rng.randint(0, 15)))
            for _ in range(80)]
    docs[5] = ""          # empty -> 0 pairs
    docs[6] = "w1"        # single token -> 0 pairs

    def brute(top_vocab):
        toks = [d.split(" ") if d else [""] for d in docs]
        # arrow split of "" yields one empty-string token; python
        # split(" ") of "" yields [""] too — keep both conventions equal
        uni = Counter(t for ts in toks for t in ts)
        n_tot, v_tot = sum(uni.values()), len(uni)
        ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(ranked[:top_vocab]) if top_vocab else dict(ranked)
        bi = Counter()
        for ts in toks:
            for a, b in zip(ts, ts[1:]):
                if a in kept and b in kept:
                    bi[(a, b)] += 1
        out = []
        for i, ts in enumerate(toks):
            pairs = list(zip(ts, ts[1:]))
            s = 0
            for a, b in pairs:
                ca = kept.get(a, 0)
                cb = kept.get(b, 0)
                c2 = bi.get((a, b), 0)
                p = (0.9 * c2 / ca if ca > 0 else 0.0) \
                    + 0.1 * (cb + 1.0) / (n_tot + v_tot)
                s += math.floor(-math.log(p) * 1e6 + 0.5)
            out.append({
                "doc_id": i, "n_pairs": len(pairs),
                "sum_nl_u": s if pairs else 0,
                "avg_nl_u": math.floor(s / len(pairs)) if pairs else -1,
            })
        return out

    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    )
    for tv in (None, 5):
        got = sorted((dict(r) for r in
                      lm_perplexity(ds, top_vocab=tv).take_all()),
                     key=lambda r: r["doc_id"])
        assert got == brute(tv), tv


def test_remove_dup_spans_nonspace_whitespace():
    """Regression: gram positions and the rewrite must tokenize the SAME
    way (single-space split).  A doc with newline-joined tokens shares a
    duplicated 8-gram; the excision must hit the right positions."""
    import ray.data

    from elasticsearch_ray.ops.dedup import dup_ngram_spans, remove_dup_spans

    shared = " ".join(f"t{i}" for i in range(8))
    docs = [
        "\n".join(f"x{i}" for i in range(12)) + " " + shared,
        shared,
        "zz yy ww vv uu tt ss rr qq",
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    )
    out = {r["doc_id"]: dict(r) for r in
           remove_dup_spans(ds, n=8, num_partitions=4).take_all()}
    # doc 0 under single-space split: ['x0\n...\nx11 t0'? no — the 12
    # x-tokens are ONE newline-joined token, then t0..t7 -> 9 tokens;
    # the shared 8-gram is t0..t7 at positions 1..8
    assert out[0]["removed_tokens"] == 8
    assert out[0]["clean_text"] == "\n".join(f"x{i}" for i in range(12))
    assert out[1]["removed_tokens"] == 8 and out[1]["clean_text"] == ""
    assert out[2]["removed_tokens"] == 0
    spans = {r["doc_id"]: r["dup_tokens"] for r in
             dup_ngram_spans(ds, n=8, num_partitions=4).take_all()}
    assert spans == {0: 8, 1: 8}  # detector agrees with the rewriter
