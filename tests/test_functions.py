"""Tests for the training-data pipeline operators (dedup, ANN, textstats)."""
import numpy as np
import pandas as pd
import pytest

import ray.data


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    rows = []
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    for i in range(40):
        rows.append({"doc_id": i, "text": f"unique document {i} " + " ".join(f"w{i}x{j}" for j in range(20))})
    # planted exact duplicates
    rows.append({"doc_id": 100, "text": base})
    rows.append({"doc_id": 101, "text": base})
    # planted near-duplicate (one word changed)
    rows.append({"doc_id": 102, "text": base.replace("today", "tonight")})
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_exact_dedup(docs_ds):
    from wse_ray.functions.dedup import exact_dedup

    out = exact_dedup(docs_ds).to_pandas()
    assert len(out) == 42  # 43 docs, one exact dup removed
    dup = out[out["n_copies"] > 1]
    assert list(dup["doc_id"]) == [100]  # min doc_id survives


def test_minhash_finds_planted_neardup(docs_ds):
    from wse_ray.functions.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(docs_ds, threshold=0.5)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (100, 101) in got  # exact dup -> jaccard 1.0
    assert (100, 102) in got or (101, 102) in got  # near dup
    # no false positives among the unique docs
    assert all(a >= 100 for a, _ in got)


def test_simhash_finds_exact_dup(docs_ds):
    from wse_ray.functions.dedup import simhash_pairs

    pairs = simhash_pairs(docs_ds, max_hamming=3)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (100, 101) in got


def test_jaccard():
    from wse_ray.functions.dedup import jaccard

    assert jaccard("a b c d", "a b c d") == 1.0
    assert jaccard("a b c d", "x y z w") == 0.0


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(200, 16))
    mat[50] = mat[10] * 1.5 + rng.normal(scale=1e-4, size=16)  # near-dup pair
    return ray.data.from_pandas(
        pd.DataFrame({"vec_id": np.arange(200), "embedding": list(mat)})
    )


def test_brute_topk_matches_numpy(vec_ds):
    from wse_ray.functions.ann import brute_topk

    out = brute_topk(vec_ds, query_ids=[0, 1], k=5)
    assert set(out["query_id"]) == {0, 1}
    assert (out.groupby("query_id")["rank"].max() == 5).all()
    # query vector's own best match is itself (cosine 1.0)
    top0 = out[(out["query_id"] == 0) & (out["rank"] == 1)].iloc[0]
    assert top0["vec_id"] == 0 and abs(top0["cosine"] - 1.0) < 1e-9


def test_ivf_recall_vs_brute(vec_ds):
    from wse_ray.functions.ann import brute_topk, ivf_topk

    qs = [0, 1, 2, 3, 4]
    brute = brute_topk(vec_ds, qs, k=5)
    approx = ivf_topk(vec_ds, qs, k=5, n_clusters=8, nprobe=4)
    recalls = []
    for q in qs:
        b = set(brute[brute["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6  # nprobe=4 of 8 cells


def test_lsh_full_probe_is_exact(vec_ds):
    """nprobe = 2**n_bits probes every bucket, so multi-probe LSH must
    degrade to exactly the brute-force scan (same ranks, same vec_ids)."""
    from wse_ray.functions.ann import brute_topk, lsh_topk

    qs = [0, 1, 2, 3, 4]
    brute = brute_topk(vec_ds, qs, k=5)
    full = lsh_topk(vec_ds, qs, k=5, n_bits=4, nprobe=16)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), brute.reset_index(drop=True)
    )


def test_lsh_recall_vs_brute(vec_ds):
    from wse_ray.functions.ann import brute_topk, lsh_topk

    qs = [0, 1, 2, 3, 4]
    brute = brute_topk(vec_ds, qs, k=5)
    approx = lsh_topk(vec_ds, qs, k=5, n_bits=4, nprobe=6)
    recalls = []
    for q in qs:
        b = set(brute[brute["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6  # nprobe=6 of 16 buckets
    # a query's own vector lives in its own (cost-0, always probed) bucket
    own = approx[approx["rank"] == 1]
    assert (own["vec_id"].to_numpy() == own["query_id"].to_numpy()).all()


def test_lsh_partition_pruned_index(vec_ds, tmp_path):
    """The persistent LSH index must (a) partition by bucket, (b) return
    the same results as the one-shot path, (c) resume without rewriting,
    and (d) rebuild when the layout params change."""
    import glob
    import json

    import numpy.testing as npt
    from wse_ray.functions.ann import build_lsh_index, lsh_search_index, lsh_topk

    idx = str(tmp_path / "lsh")
    build_lsh_index(vec_ds, idx, n_bits=4)
    assert len(glob.glob(idx + "/buckets/bucket=*")) >= 2

    qsel = vec_ds.to_pandas()
    qsel = qsel[qsel["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    q_ids = qsel["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(qsel["embedding"].to_numpy())
    via_index = lsh_search_index(idx, q_ids, q_mat, k=5, nprobe=4)
    one_shot = lsh_topk(vec_ds, [0, 1, 2], k=5, n_bits=4, nprobe=4)
    pd.testing.assert_frame_equal(
        via_index.reset_index(drop=True), one_shot.reset_index(drop=True)
    )
    npt.assert_array_equal(
        build_lsh_index(vec_ds, idx, n_bits=4), np.load(idx + "/planes.npy")
    )
    planes2 = build_lsh_index(vec_ds, idx, n_bits=5)
    assert planes2.shape[1] == 5  # rebuilt, not the stale 4-bit layout
    with open(idx + "/_SUCCESS") as f:
        assert json.load(f) == {"n_bits": 5, "seed": 13}


def test_lsh_multiprobe_order():
    """Probe order is cheapest-sign-flip-first: the query's own bucket
    leads (cost 0), then single-bit flips ordered by |projection|."""
    from wse_ray.functions.ann import _lsh_bucket, _multiprobe_order

    proj = np.array([[0.9, -0.1, 0.5]])  # bucket bits (1,0,1) -> id 0b101=5
    order = _multiprobe_order(proj)[0]
    assert order[0] == _lsh_bucket(proj)[0] == 5
    assert order[1] == 0b111  # flip cheapest bit (|-0.1|): id 7
    assert order[2] == 0b100  # next: flip 0.5 bit -> id 4


def test_embedding_dup_pairs(vec_ds):
    from wse_ray.functions.dedup import embedding_dup_pairs

    pairs = embedding_dup_pairs(vec_ds, tau=0.999)
    assert (10, 50) in set(zip(pairs["a"], pairs["b"]))


def test_textstats(docs_ds):
    from wse_ray.functions.textstats import fingerprints, lang_id, quality_score, token_stats

    ts = docs_ds.map_batches(token_stats, batch_format="pyarrow").to_pandas()
    row = ts[ts["doc_id"] == 100].iloc[0]
    assert row["n_tokens"] == 15 and row["n_distinct"] == 13
    qs = docs_ds.map_batches(quality_score, batch_format="pyarrow").to_pandas()
    assert (qs["stopword_ratio"] >= 0).all() and (qs["stopword_ratio"] <= 1).all()
    li = docs_ds.map_batches(lang_id, batch_format="pyarrow").to_pandas()
    assert li[li["doc_id"] == 100]["pred_lang"].iloc[0] == "en"
    fp = docs_ds.map_batches(fingerprints, batch_format="pyarrow").to_pandas()
    h100 = fp[fp["doc_id"] == 100].iloc[0]
    h101 = fp[fp["doc_id"] == 101].iloc[0]
    assert h100["md5"] == h101["md5"] and h100["simhash64"] == h101["simhash64"]


def test_multimodal_stage(ray_session):
    from wse_ray.functions.multimodal import DecodeMedia, synth_media_ds

    ds = synth_media_ds("/root/testdata/sf0.001")
    out = ds.map_batches(
        DecodeMedia, concurrency=2, batch_size=64, batch_format="pyarrow"
    ).to_pandas()
    assert len(out) == 500
    assert out["decoded"].all()
    assert (out["width"] >= 16).all() and (out["n_bytes"] > 0).all()


def test_ivf_partition_pruned_index(vec_ds, tmp_path):
    """The persistent IVF index must (a) read only the probed cells and
    (b) return the same results as the one-shot path."""
    from wse_ray.functions.ann import build_ivf_index, ivf_search_index, ivf_topk

    idx = str(tmp_path / "ivf")
    build_ivf_index(vec_ds, idx, n_clusters=8, sample_rows=2000)
    import glob
    assert len(glob.glob(idx + "/cells/cell=*")) >= 2

    qsel = vec_ds.to_pandas()
    qsel = qsel[qsel["vec_id"].isin([0, 1, 2])].sort_values("vec_id")
    q_ids = qsel["vec_id"].to_numpy(np.int64)
    q_mat = np.stack(qsel["embedding"].to_numpy())
    via_index = ivf_search_index(idx, q_ids, q_mat, k=5, nprobe=2)
    one_shot = ivf_topk(vec_ds, [0, 1, 2], k=5, n_clusters=8, nprobe=2)
    pd.testing.assert_frame_equal(
        via_index.reset_index(drop=True), one_shot.reset_index(drop=True)
    )
    # build is resumable: second call loads centroids without rewriting
    import numpy.testing as npt
    npt.assert_array_equal(build_ivf_index(vec_ds, idx, n_clusters=8), np.load(idx + "/centroids.npy"))


def test_ivf_index_params_change_forces_rebuild(ray_session, tmp_path):
    """A persistent IVF index built with different n_clusters must be
    rebuilt on reuse, not silently served with a stale layout."""
    import json

    import ray.data
    from wse_ray.functions.ann import build_ivf_index

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(64, dtype=np.int64),
            "embedding": list(rng.normal(size=(64, 8)).astype(np.float32)),
        }
    )
    vec_ds = ray.data.from_pandas(df, override_num_blocks=2)
    idx = str(tmp_path / "ivf")
    c1 = build_ivf_index(vec_ds, idx, n_clusters=4, sample_rows=64)
    assert len(c1) == 4
    c2 = build_ivf_index(vec_ds, idx, n_clusters=8, sample_rows=64)
    assert len(c2) == 8  # rebuilt, not the stale 4-cell layout
    with open(idx + "/_SUCCESS") as f:
        assert json.load(f) == {"n_clusters": 8, "sample_rows": 64}


def test_minhash_scratch_resume(ray_session, tmp_path):
    """With a caller-supplied scratch dir, completed storage stages are
    marked and skipped on rerun (same results, band files untouched); a
    layout-param change invalidates the cache and rebuilds."""
    import glob
    import os

    import ray.data
    from wse_ray.functions.dedup import minhash_dedup_pairs

    rows = [{"doc_id": i, "text": "resume me please now " * 4} for i in range(5)]
    rows += [
        {"doc_id": 30 + i, "text": " ".join(f"k{i}l{j}" for j in range(20))}
        for i in range(3)
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    scratch = str(tmp_path / "scr")
    os.makedirs(scratch)
    p1 = minhash_dedup_pairs(ds, threshold=0.9, scratch_dir=scratch)
    band_files = sorted(glob.glob(scratch + "/bands/bpart=*/*.parquet"))
    assert band_files and os.path.exists(scratch + "/bands/_SUCCESS")
    mt = [os.path.getmtime(f) for f in band_files]
    p2 = minhash_dedup_pairs(ds, threshold=0.9, scratch_dir=scratch)
    pd.testing.assert_frame_equal(p1, p2)
    assert [os.path.getmtime(f) for f in sorted(
        glob.glob(scratch + "/bands/bpart=*/*.parquet"))] == mt  # stage skipped
    # layout-param change -> cache invalidated, stages rebuilt, still correct
    p3 = minhash_dedup_pairs(ds, threshold=0.9, scratch_dir=scratch, bands=8)
    assert set(zip(p1["a"], p1["b"])) == set(zip(p3["a"], p3["b"]))
    assert sorted(glob.glob(scratch + "/bands/bpart=*/*.parquet")) != band_files or [
        os.path.getmtime(f) for f in band_files if os.path.exists(f)
    ] != mt


def test_minhash_nondefault_verify_parts(ray_session):
    """verify_parts decoupled from bucket_parts must not change results
    (pair routing and shingle co-shuffle agree partition-for-partition)."""
    import ray.data
    from wse_ray.functions.dedup import minhash_dedup_pairs

    rows = [{"doc_id": i, "text": "common shared sentence here " * 4} for i in range(6)]
    rows += [
        {"doc_id": 50 + i, "text": " ".join(f"r{i}s{j}" for j in range(25))}
        for i in range(4)
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    base = minhash_dedup_pairs(ds, threshold=0.9)
    alt = minhash_dedup_pairs(ds, threshold=0.9, bucket_parts=5, verify_parts=3)
    pd.testing.assert_frame_equal(base, alt)


def test_minhash_band_match_prefilter(ray_session):
    """min_band_matches=2 must keep high-Jaccard planted dups (exact dups
    match in all 16 bands) while still returning the identical pair set on
    this corpus; a doc with no near-dup must never appear."""
    import ray.data
    from wse_ray.functions.dedup import minhash_dedup_pairs

    rows = [{"doc_id": i, "text": "same exact words here " * 5} for i in range(8)]
    rows += [
        {"doc_id": 100 + i, "text": " ".join(f"u{i}v{j}" for j in range(30))}
        for i in range(5)
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    base = minhash_dedup_pairs(ds, threshold=0.9)
    filt = minhash_dedup_pairs(ds, threshold=0.9, min_band_matches=2)
    assert len(base) == 8 * 7 // 2
    pd.testing.assert_frame_equal(base, filt)


def test_simhash_giant_cluster_star_pairs(ray_session):
    """30 identical docs with a tiny bucket-member cap must still all
    collapse to one representative through the star-pair fallback
    (identical fingerprints -> every star edge verifies at hamming 0)."""
    import ray.data
    from wse_ray.functions.dedup import dedup_clusters, simhash_pairs

    rows = [{"doc_id": i, "text": "same exact words here " * 5} for i in range(30)]
    rows += [
        {"doc_id": 100 + i, "text": " ".join(f"w{i}x{j}" for j in range(40))}
        for i in range(5)
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    pairs = simhash_pairs(ds, max_hamming=3, max_bucket_members=8)
    clusters = dedup_clusters(pairs)
    dup_reps = clusters[clusters["doc_id"] < 100]["rep_id"]
    assert (dup_reps == 0).all() and len(dup_reps) == 30


def test_shingle_hash_batch_matches_python_reference():
    """Independent pure-Python FNV-1a + mix reference for the vectorized
    batch shingle path (hash values are load-bearing for minhash/ngram)."""
    import pyarrow as pa
    from wse_ray.stages.vectorized_tokenize import shingle_hash_batch
    from wse_ray.tokenizer import tokenize_simple

    def fnv(b: bytes) -> int:
        h = 0xCBF29CE484222325
        for x in b:
            h = ((h ^ x) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def ref(text: str, k: int = 3) -> list[int]:
        toks = tokenize_simple(text.encode())
        if not toks:
            return []
        h = [fnv(t) for t in toks]
        kk = min(k, len(h))
        out = []
        for s in range(len(h) - kk + 1):
            c = h[s]
            for j in range(1, kk):
                c = ((c * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF) ^ h[s + j]
            out.append(c)
        return out

    texts = ["hello world foo bar", "", "one", "a b", "x  y\tz w", "a a a a a"]
    flat, off = shingle_hash_batch(
        pa.array([t.encode() for t in texts], pa.large_binary()), 3
    )
    for i, t in enumerate(texts):
        assert flat[off[i] : off[i + 1]].tolist() == ref(t), t


def test_rolling64_pinned_values():
    """Pin _rolling64_batch values (natural 2**64 wrap, base 1000003) so
    any future modulus/base drift is visible — fingerprints may be
    persisted, so the format must not change silently."""
    from wse_ray.functions.textstats import _rolling64_batch

    docs = [b"", b"a", b"abc", b"hello world", bytes(range(200)) * 6]
    data = np.frombuffer(b"".join(docs), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum([len(d) for d in docs]))).astype(np.int64)
    got = _rolling64_batch(data, offsets)
    assert got.tolist() == [
        0,
        97,
        97000680001266,
        14297433070501965380,
        6472281748459570200,
    ]


def test_simhash_batch_equals_scalar():
    from hypothesis import given, settings, strategies as st
    import pyarrow as pa
    from wse_ray.functions.textstats import _flat_tf, _simhash64_batch, simhash64

    @given(st.lists(st.text(alphabet="abc xyz.,", max_size=60), min_size=1, max_size=8))
    @settings(max_examples=40, deadline=None)
    def check(texts):
        batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
        terms, tfs, off, _ = _flat_tf(batch)
        got = _simhash64_batch(terms, tfs, off)
        want = [simhash64(t.encode()) for t in texts]
        assert got.tolist() == want

    check()


def test_ngram_jaccard_exact(docs_ds):
    """The exact inverted-shingle-index engine must agree with the LSH
    route on the planted dups (and find the exact-dup pair at jaccard 1)."""
    from wse_ray.functions.dedup import minhash_dedup_pairs, ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(docs_ds, threshold=0.5)
    got = dict(zip(zip(exact["a"], exact["b"]), exact["jaccard"]))
    assert got[(100, 101)] == 1.0
    lsh = minhash_dedup_pairs(docs_ds, threshold=0.5)
    lsh_pairs = dict(zip(zip(lsh["a"], lsh["b"]), lsh["jaccard"]))
    # LSH output is a subset of the exact output with identical jaccards
    for k, v in lsh_pairs.items():
        assert got[k] == v


def test_minhash_bands_batch_equals_per_doc():
    import pyarrow as pa
    from wse_ray.functions.dedup import MinHashBands, minhash_signature, shingle_hashes

    texts = ["the quick brown fox jumps over", "", "a b", "x " * 100, "one two three four"]
    batch = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    mb = MinHashBands(num_perm=64, bands=16)
    out = mb(batch).to_pandas()
    # reconstruct expected band hashes from the scalar signature path
    import numpy as np
    mul = np.uint64(0x9E3779B97F4A7C15)
    for i, t in enumerate(texts):
        sig = minhash_signature(shingle_hashes(t, 3), mb.a, mb.b)
        for bi in range(16):
            chunk = sig[bi * 4 : (bi + 1) * 4]
            h = np.uint64(bi + 1)
            for c in chunk:
                h = (h ^ c) * mul
            got = out[(out["doc_id"] == i) & (out["band_id"] == bi)]["band_hash"].iloc[0]
            assert np.uint64(got) == h, (i, bi)


def test_dedup_clusters_and_star_pairs():
    import pandas as pd
    from wse_ray.functions.dedup import dedup_clusters, _bucket_pairs

    # chain 1-2, 2-3 plus isolated pair 7-9 -> components {1,2,3} and {7,9}
    pairs = pd.DataFrame({"a": [1, 2, 7], "b": [2, 3, 9], "jaccard": [1.0, 1.0, 1.0]})
    out = dedup_clusters(pairs)
    got = dict(zip(out["doc_id"], out["rep_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    # star fallback for giant buckets keeps the cluster connected
    g = pd.DataFrame({"doc_id": list(range(10))})
    star = _bucket_pairs(g, max_bucket_members=5)
    assert len(star) == 9 and (star["a"] == 0).all()
    clusters = dedup_clusters(star.assign(jaccard=1.0))
    assert (clusters["rep_id"] == 0).all() and len(clusters) == 10


def test_minhash_giant_cluster_star_pairs(ray_session):
    """50 identical docs with a tiny pair cap must still all collapse to
    one representative."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.dedup import dedup_clusters, minhash_dedup_pairs

    rows = [{"doc_id": i, "text": "same exact words here " * 5} for i in range(50)]
    rows += [{"doc_id": 100 + i, "text": f"unique {i} " + " ".join(f"q{i}z{j}" for j in range(15))} for i in range(5)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    pairs = minhash_dedup_pairs(ds, threshold=0.9, max_bucket_members=8)
    clusters = dedup_clusters(pairs)
    dup_reps = clusters[clusters["doc_id"] < 100]["rep_id"]
    assert (dup_reps == 0).all() and len(dup_reps) == 50


def test_histogram_quantiles_matches_sorted_rule(ray_session):
    """The sketch must reproduce quantile_disc (sorted value at
    ceil(q*n)-1) exactly, including duplicate-heavy and 1-row keys."""
    import math

    import pandas as pd
    import ray.data
    from wse_ray.functions.sketches import histogram_quantiles

    rng = np.random.default_rng(7)
    vals = np.round(rng.uniform(0, 100, size=2000), 2)
    vals[:500] = 42.0  # heavy tie mass
    keys = np.where(np.arange(2000) % 3 == 0, "a", "b")
    df = pd.DataFrame({"k": keys, "v": vals})
    df = pd.concat(
        [df, pd.DataFrame({"k": ["solo"], "v": [3.14]})], ignore_index=True
    )
    ds = ray.data.from_pandas(df).repartition(6)
    qs = [0.01, 0.25, 0.5, 0.9, 1.0]
    got = histogram_quantiles(ds, "v", "k", qs=qs, decimals=2)
    for key, g in df.groupby("k"):
        s = np.sort(np.floor(g["v"].to_numpy() * 100) / 100)
        for q in qs:
            want = s[max(1, math.ceil(q * len(s))) - 1]
            have = got[(got["k"] == key) & (got["q"] == q)]["quantile"].iloc[0]
            assert have == want, (key, q, have, want)


def test_normalize_text_matches_duckdb_expression():
    """Messy inputs (tabs, CRLF, runs, unicode case) must normalize exactly
    like the oracle's lower+regexp_replace+trim expression."""
    import duckdb
    import pyarrow as pa
    from wse_ray.functions.dedup import normalize_text_batch

    messy = [
        "  Hello\t\tWORLD  \n",
        "a  b\r\nc",
        "Über  CafÉ",
        "already clean",
        "",
        "   ",
        "MiXeD\tCase  RUN",
    ]
    t = pa.table({"doc_id": list(range(len(messy))), "text": messy})
    got = normalize_text_batch(t)["text"].to_pylist()
    con = duckdb.connect()
    want = [
        con.sql(
            r"SELECT trim(regexp_replace(lower(?), '\s+', ' ', 'g'))", params=[m]
        ).fetchone()[0]
        for m in messy
    ]
    assert got == want


def test_cap_per_key_skewed(ray_session):
    """One hot key with 400 rows spread over many blocks must still cap at
    k, and the combiner must not drop any globally-smallest ids."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.sampling import cap_per_key

    rng = np.random.default_rng(3)
    ids = rng.permutation(500)
    keys = np.where(ids < 400, "hot", np.char.add("cold", (ids % 7).astype(str)))
    df = pd.DataFrame({"doc_id": ids, "source": keys})
    ds = ray.data.from_pandas(df).repartition(10)
    out = cap_per_key(ds, "source", "doc_id", k=3).to_pandas()
    want = (
        df.sort_values("doc_id").groupby("source", sort=False).head(3)
    )
    got = out.sort_values(["source", "doc_id"]).reset_index(drop=True)
    want = want.sort_values(["source", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "source"]], want[["doc_id", "source"]], check_dtype=False
    )


def test_hash_sample_content_keyed(ray_session):
    """Exact duplicates must sample together (content-keyed determinism)."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.sampling import hash_sample

    rows = [{"doc_id": i, "text": f"doc number {i % 20}"} for i in range(200)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(5)
    out = hash_sample(ds, keep_of_65536=0x8000).to_pandas()
    kept_texts = set(out["text"])
    for t in kept_texts:
        assert (out["text"] == t).sum() == 10  # all 10 copies survive


def test_histogram_quantiles_negative_values(ray_session):
    """Negative bins exercise the arithmetic-shift coarse binning."""
    import math

    import pandas as pd
    import ray.data
    from wse_ray.functions.sketches import histogram_quantiles

    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(-500, 500, size=3000), 2)
    df = pd.DataFrame({"k": ["x"] * 3000, "v": vals})
    ds = ray.data.from_pandas(df).repartition(4)
    got = histogram_quantiles(ds, "v", "k", qs=[0.1, 0.5, 0.99], decimals=2, shift=8)
    s = np.sort(np.floor(vals * 100) / 100)
    for q in [0.1, 0.5, 0.99]:
        want = s[max(1, math.ceil(q * len(s))) - 1]
        have = got[got["q"] == q]["quantile"].iloc[0]
        assert have == want, (q, have, want)


def test_decontam_planted_overlap(ray_session):
    """Planted 5-gram overlap is found with exact distinct-gram counts;
    short docs (< k tokens) emit no grams and never hit."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.decontam import benchmark_gram_set, contamination_hits

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # copies the bench doc's first 5-gram twice (distinct count = 1)
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon x "
                              "alpha beta gamma delta epsilon"},
        # two distinct overlapping grams (windows 2..3 of bench doc)
        {"doc_id": 2, "text": "beta gamma delta epsilon zeta eta"},
        {"doc_id": 3, "text": "totally unrelated words with no overlap at all"},
        # contains bench tokens but shorter than k -> no grams, no hit
        {"doc_id": 4, "text": "alpha beta gamma delta"},
    ]
    bench = ray.data.from_pandas(pd.DataFrame([{"doc_id": 0, "text": bench_text}]))
    corpus = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    grams = benchmark_gram_set(bench, k=5)
    assert len(grams) == 4  # 8 tokens -> 4 windows
    out = contamination_hits(corpus, grams, k=5).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_hits"].tolist() == [1, 2]


def test_decontam_bloom_superset_and_fp_envelope(ray_session):
    """The Bloom route NEVER drops a true hit (no false negatives, count
    >= exact count per doc), and its gram-level false-positive rate on a
    disjoint probe set stays inside the sizing envelope."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.decontam import (
        BloomFilter,
        benchmark_bloom,
        benchmark_gram_set,
        contamination_hits,
        contamination_hits_bloom,
    )

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon x "
                              "alpha beta gamma delta epsilon"},
        {"doc_id": 2, "text": "beta gamma delta epsilon zeta eta"},
        {"doc_id": 3, "text": "totally unrelated words with no overlap at all"},
        {"doc_id": 4, "text": "alpha beta gamma delta"},
    ]
    bench = ray.data.from_pandas(pd.DataFrame([{"doc_id": 0, "text": bench_text}]))
    corpus = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    exact = (
        contamination_hits(corpus, benchmark_gram_set(bench, k=5), k=5)
        .to_pandas().set_index("doc_id")["n_hits"]
    )
    bloom = (
        contamination_hits_bloom(corpus, benchmark_bloom(bench, k=5), k=5)
        .to_pandas().set_index("doc_id")["n_hits"]
    )
    for doc_id, n in exact.items():  # containment: every exact hit survives
        assert bloom.get(doc_id, 0) >= n

    # FP envelope: probe 200k hashes disjoint from the 10k stored ones
    rng = np.random.default_rng(5)
    stored = rng.integers(0, 1 << 63, size=10_000, dtype=np.uint64)
    blm = BloomFilter(stored, bits_per_elem=16, n_hashes=11)
    assert blm.contains(stored).all()  # no false negatives, ever
    probes = rng.integers(0, 1 << 63, size=200_000, dtype=np.uint64)
    fresh = probes[~np.isin(probes, stored)]
    fp_rate = blm.contains(fresh).mean()
    # theoretical ~(1-e^(-11/16))^11 ~ 2e-4 with m rounded UP to a power
    # of two (so real rate is at or below nominal); allow 3x slack
    assert fp_rate < 6e-4, fp_rate


def test_weighted_sample_proportional_and_stable(ray_session):
    """A-ES weighted sampling: (a) rerun-stable (pure function of id+salt),
    (b) inclusion frequency across many salts tracks the weights, (c) a
    zero-ish weight is effectively never drawn against heavy rows."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.sampling import weighted_sample

    df = pd.DataFrame(
        {"doc_id": np.arange(60), "w": np.where(np.arange(60) < 10, 100.0, 1.0)}
    )
    ds = ray.data.from_pandas(df).repartition(3)
    a = weighted_sample(ds, k=5, weight_col="w")
    b = weighted_sample(ds, k=5, weight_col="w")
    pd.testing.assert_frame_equal(a, b)  # deterministic
    assert a["rank"].tolist() == [1, 2, 3, 4, 5]

    heavy_hits = 0
    for salt in range(30):
        s = weighted_sample(ds, k=5, weight_col="w", salt=str(salt))
        heavy_hits += int((s["doc_id"] < 10).sum())
    # heavy ids hold 10*100 of the 10*100+50*1 total weight (~95%); with
    # k=5 over 30 salts the heavy share of 150 draws concentrates hard
    assert heavy_hits >= 120, heavy_hits


def test_repetition_stats_hand_values(ray_session):
    """Hand-checked n-gram repetition fractions, incl. short-doc masking."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.textstats import repetition_stats

    rows = [
        # "a b a b a": bigrams [ab, ba, ab, ba] -> top 2/4; trigrams
        # [aba, bab, aba] -> distinct 2 of 3 -> dup 1/3
        {"doc_id": 1, "text": "a b a b a"},
        # all-distinct grams: top bigram 1/3, dup trigram 0
        {"doc_id": 2, "text": "w x y z"},
        # 1 token: no bigrams/trigrams -> both 0 (whole-seq shingle masked)
        {"doc_id": 3, "text": "solo"},
        # 2 tokens: one bigram (top frac 1.0), no trigram
        {"doc_id": 4, "text": "pair pair"},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = (
        ds.map_batches(repetition_stats, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["top_bigram_frac"].tolist() == [0.5, round(1 / 3, 6), 0.0, 1.0]
    assert out["dup_trigram_frac"].tolist() == [round(1 / 3, 6), 0.0, 0.0, 0.0]


def test_pii_scrub_planted(ray_session):
    """Planted emails/IPs/phones: the Ray RE2 kernels and the DuckDB oracle
    SQL (run on the SAME planted frame) agree on counts and redacted md5 —
    this pins the FIRING semantics the zero-PII driver corpus can't."""
    import duckdb
    import pandas as pd
    import ray.data
    from wse_ray.functions.pii import pii_scrub
    from wse_ray.pipelines.oracles import sql_pii_scrub

    rows = [
        {"doc_id": 1, "text": "contact bob.smith+x@example.co.uk or admin@y.io now"},
        {"doc_id": 2, "text": "server at 10.0.255.1 and 192.168.1.77, call 555-123-4567"},
        {"doc_id": 3, "text": "no pii here at all"},
        # email whose redaction must not leave a countable ip; phone-like
        # digits inside an ip must not double-count
        {"doc_id": 4, "text": "x@1.2.3.4.example.com then 1.2.3.4 then 123-456-7890"},
    ]
    df = pd.DataFrame(rows)
    got = (
        ray.data.from_pandas(df)
        .map_batches(pii_scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(sql_pii_scrub()).df()
    pd.testing.assert_frame_equal(
        got.astype({"n_email": "int64", "n_ipv4": "int64", "n_phone": "int64"}),
        want.astype({"n_email": "int64", "n_ipv4": "int64", "n_phone": "int64"}),
        check_dtype=False,
    )
    assert got["n_email"].tolist() == [2, 0, 0, 1]
    assert got["n_ipv4"].tolist() == [0, 2, 0, 1]
    assert got["n_phone"].tolist() == [0, 1, 0, 1]


def test_kmeans_planted_blobs(ray_session):
    """K-means recovers well-separated planted Gaussian blobs exactly, and
    inertia is monotone non-increasing across Lloyd's iterations."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.clustering import kmeans_assign, kmeans_fit

    rng = np.random.default_rng(7)
    k, per, d = 4, 50, 16
    centers = rng.normal(size=(k, d)) * 20.0
    X = np.concatenate([c + rng.normal(size=(per, d)) for c in centers])
    truth = np.repeat(np.arange(k), per)
    order = rng.permutation(len(X))
    X, truth = X[order], truth[order]
    df = pd.DataFrame(
        {"vec_id": np.arange(len(X)), "embedding": [v.astype(np.float32) for v in X]}
    )
    ds = ray.data.from_pandas(df).repartition(3)
    C, hist = kmeans_fit(ds, k=k, iters=6)
    assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:])), hist
    out = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
    # each found cluster maps 1:1 onto one planted blob
    m = pd.DataFrame({"cluster": out["cluster"].to_numpy(), "truth": truth})
    purity = m.groupby("cluster")["truth"].agg(
        lambda s: s.value_counts().iloc[0]
    ).sum() / len(m)
    assert purity == 1.0, purity
    assert m.groupby("cluster")["truth"].nunique().max() == 1


def test_rebalance_sources_skewed(ray_session):
    """Skewed mixture: the big source downsamples toward its target, the
    small source (already under target) keeps everything; explicit weights
    steer the per-source targets."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.sampling import rebalance_sources

    rows = [{"doc_id": i, "source": "big", "text": f"big doc {i}"} for i in range(400)]
    rows += [{"doc_id": 1000 + i, "source": "small", "text": f"small doc {i}"} for i in range(20)]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)

    out = rebalance_sources(ds, total=200).to_pandas()
    by = out.groupby("source").size()
    assert by["small"] == 20  # under its 100-target -> keep-all
    assert 60 <= by["big"] <= 140  # hash-binomial around the 100-target

    # weights: starve 'big' (10% of 200 = 20-target), boost 'small'
    w = {"big": 0.1, "small": 0.9}
    outw = rebalance_sources(ds, total=200, weights=w).to_pandas()
    byw = outw.groupby("source").size()
    assert byw["small"] == 20
    assert byw["big"] < by["big"]
    # sources absent from an explicit weights dict are dropped, not a crash
    out_only = rebalance_sources(ds, total=200, weights={"small": 1.0}).to_pandas()
    assert set(out_only["source"]) == {"small"}
    # determinism: identical rerun
    out2 = rebalance_sources(ds, total=200).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_pack_windows_multifile(ray_session):
    """Packing invariants over a 3-file corpus with an empty doc: global
    offsets are a contiguous prefix sum across files, window indices match
    direct arithmetic, and a rerun is identical."""
    import os
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from wse_ray.functions.packing import pack_windows

    tmp = tempfile.mkdtemp(prefix="packtest_")
    texts, did = [], 0
    paths = []
    rng = np.random.default_rng(3)
    for f in range(3):
        rows = []
        for _ in range(40):
            ntok = int(rng.integers(0, 30))  # includes empty docs
            rows.append({"doc_id": did, "text": " ".join(["w"] * ntok)})
            did += 1
        p = os.path.join(tmp, f"part{f}.parquet")
        pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows)), p, row_group_size=16)
        paths.append(p)
        texts.extend(r["text"] for r in rows)

    W = 16
    out = pack_windows(paths, window=W).to_pandas().sort_values("doc_id").reset_index(drop=True)
    ntok = np.array([len(t.split()) if t else 0 for t in texts])
    start = np.concatenate(([0], np.cumsum(ntok)[:-1]))
    assert (out["tok_start"].to_numpy() == start).all()
    assert (out["n_tokens"].to_numpy() == ntok).all()
    assert (out["win_start"].to_numpy() == start // W).all()
    last = np.where(ntok > 0, start + ntok - 1, start)
    assert (out["win_end"].to_numpy() == last // W).all()
    out2 = pack_windows(paths, window=W).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_unigram_lm_score_hand_values(ray_session):
    """Hand-computed corpus-unigram mean log-probs."""
    import math

    import pandas as pd
    import ray.data
    from wse_ray.functions.textstats import unigram_lm_score

    # unigrams: a:2 b:2 c:1 (total 5); the empty doc emits NO row (it has
    # no LM score — matching the oracle's GROUP BY, and a 0.0 would rank
    # empty docs as highest quality)
    rows = [
        {"doc_id": 1, "text": "a a b"},
        {"doc_id": 2, "text": "b c"},
        {"doc_id": 3, "text": ""},
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(2)
    out = unigram_lm_score(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want1 = round(math.log(2 / 5), 6)
    want2 = round((math.log(2 / 5) + math.log(1 / 5)) / 2, 6)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["lm_logprob"].tolist() == [want1, want2]


def test_centroid_cosine_outlier(ray_session):
    """A planted far-off vector scores lowest; tight cluster scores ~1."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.clustering import centroid_cosine

    rng = np.random.default_rng(5)
    base = np.ones(8) * 10.0
    vecs = [base + rng.normal(scale=0.1, size=8) for _ in range(50)]
    vecs.append(-base)  # antipodal outlier
    df = pd.DataFrame(
        {"vec_id": np.arange(51), "embedding": [v.astype(np.float32) for v in vecs]}
    )
    out = (
        centroid_cosine(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out["cos_centroid"].idxmin() == 50
    assert out["cos_centroid"][:50].min() > 0.99
    assert out["cos_centroid"][50] < -0.9


def test_training_shuffle_permutation(ray_session):
    """Seeded shuffle is a full permutation, deterministic across reruns,
    and different seeds give different orders."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.sampling import training_shuffle

    df = pd.DataFrame({"doc_id": np.arange(300)})
    ds = ray.data.from_pandas(df).repartition(4)
    a = training_shuffle(ds, seed=1).to_pandas()
    assert sorted(a["doc_id"]) == list(range(300))  # permutation, no loss
    assert not (a["doc_id"].to_numpy() == np.arange(300)).all()  # shuffled
    b = training_shuffle(ds, seed=1).to_pandas()
    assert (a["doc_id"].to_numpy() == b["doc_id"].to_numpy()).all()
    c = training_shuffle(ds, seed=2).to_pandas()
    assert not (a["doc_id"].to_numpy() == c["doc_id"].to_numpy()).all()


def test_hll_error_bound_and_merge_independence(ray_session):
    """HLL estimates stay within ~3 standard errors of exact (p=12 ->
    1.04/sqrt(4096) ~ 1.6%), and the result is identical under different
    partitionings (max-merge is order/partition independent)."""
    import pandas as pd
    import ray.data
    from wse_ray.functions.sketches import hll_distinct_daily

    rng = np.random.default_rng(13)
    n = 120_000
    ts = np.datetime64("2024-03-01") + rng.integers(0, 3, n).astype("timedelta64[D]")
    uid = rng.integers(0, 40_000, n)
    df = pd.DataFrame({"ts": pd.to_datetime(ts), "user_id": uid})
    exact = df.groupby(df["ts"].dt.floor("D"))["user_id"].nunique()

    est1 = hll_distinct_daily(ray.data.from_pandas(df).repartition(2), p=12)
    est8 = hll_distinct_daily(ray.data.from_pandas(df).repartition(8), p=12)
    pd.testing.assert_frame_equal(est1, est8)  # partitioning-independent
    for _, row in est1.iterrows():
        ex = exact[pd.Timestamp(row["day"])]
        assert abs(row["n_users_approx"] - ex) / ex < 0.05, (row, ex)


def test_bpe_token_count_punctuation(ray_session):
    """BPE-ish pre-tokens split letter/digit/punct runs — matches the
    DuckDB oracle on punctuation-heavy planted text."""
    import duckdb
    import pandas as pd
    import ray.data
    from wse_ray.functions.textstats import bpe_token_count
    from wse_ray.pipelines.oracles import sql_bpe_token_count

    rows = [
        {"doc_id": 1, "text": "hello world"},          # 2
        {"doc_id": 2, "text": "a1b2!?x"},              # a,1,b,2,!?,x = 6
        {"doc_id": 3, "text": "don't stop--now 42"},   # don,',t,stop,--,now,42 = 7
        {"doc_id": 4, "text": ""},                     # 0
    ]
    df = pd.DataFrame(rows)
    got = (
        ray.data.from_pandas(df)
        .map_batches(bpe_token_count, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_bpe_tokens"].tolist() == [2, 6, 7, 0]
    con = duckdb.connect()
    con.register("documents", df)
    want = con.sql(sql_bpe_token_count()).df()
    assert got["n_bpe_tokens"].tolist() == want["n_bpe_tokens"].tolist()


def test_curate_corpus_drop_reasons(ray_session):
    """Each curation stage drops exactly its targets: short docs, repetitive
    docs, non-survivor duplicates, and benchmark-contaminated docs."""
    import pandas as pd
    import ray.data
    from wse_ray.pipelines.curation import curate_corpus

    good = " ".join(f"w{i}" for i in range(30))
    good2 = " ".join(f"x{i}" for i in range(25))
    contaminated = "c0 c1 c2 c3 c4 " + " ".join(f"y{i}" for i in range(20))
    rows = [
        {"doc_id": 1, "source": "s", "text": good},            # kept
        {"doc_id": 2, "source": "s", "text": good},            # dup of 1 -> dropped
        {"doc_id": 3, "source": "s", "text": "too short"},     # short -> dropped
        {"doc_id": 4, "source": "s", "text": "r e p " * 10},   # repetitive -> dropped
        {"doc_id": 5, "source": "s", "text": contaminated},    # bench 5-gram -> dropped
        {"doc_id": 6, "source": "s", "text": good2},           # kept
    ]
    bench = pd.DataFrame(
        [{"doc_id": 100, "text": "c0 c1 c2 c3 c4 " + " ".join(f"z{i}" for i in range(10))}]
    )
    out = (
        curate_corpus(
            ray.data.from_pandas(pd.DataFrame(rows)).repartition(2),
            ray.data.from_pandas(bench),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 6]
    assert out["n_tokens"].tolist() == [30, 25]


def test_lsh_partial_build_dir_is_cleaned(vec_ds, tmp_path):
    """A crashed LSH build (bucket files present, no _SUCCESS) must be
    wiped on rebuild, not appended to — duplicates would corrupt top-k."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from wse_ray.functions.ann import brute_topk, build_lsh_index, lsh_search_index

    idx = str(tmp_path / "lsh_partial")
    junk = os.path.join(idx, "buckets", "bucket=0")
    os.makedirs(junk)
    qsel = vec_ds.to_pandas().sort_values("vec_id").head(3)
    pq.write_table(  # a stale fragment duplicating real vectors
        pa.table({"vec_id": qsel["vec_id"].to_numpy(), "embedding": list(qsel["embedding"])}),
        os.path.join(junk, "stale.parquet"),
    )
    build_lsh_index(vec_ds, idx, n_bits=4)  # no _SUCCESS -> must start clean
    q_ids = qsel["vec_id"].to_numpy()
    q_mat = np.stack(qsel["embedding"].to_numpy())
    got = lsh_search_index(idx, q_ids, q_mat, k=5, nprobe=16)  # full probe
    want = brute_topk(vec_ds, q_ids.tolist(), k=5)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_knn_join_block_invariant(vec_ds, tmp_path):
    """The exact kNN graph is invariant to the block split (1 block == the
    trivial all-pairs scan), excludes self-matches, and ranks by
    (rounded cosine desc, neighbor id)."""
    import pyarrow.parquet as pq
    from wse_ray.functions.ann import knn_join

    import pyarrow as pa

    path = str(tmp_path / "emb.parquet")
    pq.write_table(pa.Table.from_pandas(vec_ds.to_pandas()), path)
    one = knn_join(path, k=4, block_rows=400)   # single block
    many = knn_join(path, k=4, block_rows=37)   # ragged multi-block
    pd.testing.assert_frame_equal(
        one.reset_index(drop=True), many.reset_index(drop=True)
    )
    assert (one["vec_id"] != one["nbr_id"]).all()
    assert (one.groupby("vec_id")["rank"].max() == 4).all()
    # the planted near-dup pair must be each other's rank-1 neighbor
    assert one[(one["vec_id"] == 10) & (one["rank"] == 1)]["nbr_id"].iloc[0] == 50
    assert one[(one["vec_id"] == 50) & (one["rank"] == 1)]["nbr_id"].iloc[0] == 10


def test_knn_join_storage_reduce_identical(vec_ds, tmp_path):
    """The storage-shuffled reduce (one task per source block, driver holds
    only N x k) must equal the driver-merge path exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from wse_ray.functions.ann import knn_join

    path = str(tmp_path / "emb.parquet")
    pq.write_table(pa.Table.from_pandas(vec_ds.to_pandas()), path)
    driver = knn_join(path, k=4, block_rows=37)
    storage = knn_join(
        path, k=4, block_rows=37, scratch_dir=str(tmp_path / "scratch")
    )
    pd.testing.assert_frame_equal(driver, storage)


def test_topk_boundary_ties_are_split_invariant(ray_session, tmp_path):
    """> k duplicate vectors (all cosines tied at a rank-k boundary): the
    local per-block/batch cut must keep the tie-break winners (lowest ids),
    so results are identical across block splits, reduce paths, and the
    brute-force scan — the oracle's (rounded cosine desc, id asc) rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from wse_ray.functions.ann import brute_topk, knn_join

    rng = np.random.default_rng(11)
    mat = rng.normal(size=(30, 8))
    mat[:10] = mat[0]  # ids 0..9 identical -> 9 tied neighbors each
    df = pd.DataFrame({"vec_id": np.arange(30), "embedding": list(mat)})
    path = str(tmp_path / "dups.parquet")
    pq.write_table(pa.Table.from_pandas(df), path)

    one = knn_join(path, k=4, block_rows=100)
    many = knn_join(path, k=4, block_rows=7)
    storage = knn_join(path, k=4, block_rows=7, scratch_dir=str(tmp_path / "s"))
    pd.testing.assert_frame_equal(one, many)
    pd.testing.assert_frame_equal(one, storage)
    # vec 0's neighbors are its tied duplicates, lowest ids first
    assert one[one["vec_id"] == 0]["nbr_id"].tolist() == [1, 2, 3, 4]

    ds = ray.data.from_pandas(df).repartition(5)
    bru = brute_topk(ds, query_ids=[0], k=4)
    assert bru["vec_id"].tolist() == [0, 1, 2, 3]  # rank1 = itself (id tie)
