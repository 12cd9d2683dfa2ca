"""Incremental index extension (index/extend.py) must serve BIT-IDENTICAL
search results to a from-scratch rebuild of the concatenated corpus, for
both partition layouts, every query mode, single-node and sharded."""
import glob
import json
import os

import pytest

from wse_ray.config import BuildConfig
from wse_ray.fixtures import make_queries, write_corpus_parquet
from wse_ray.index.build import build_index
from wse_ray.index.extend import extend_index, refresh_bounds
from wse_ray.query.scorer import SearchEngine


@pytest.fixture(scope="module")
def split_corpus(ray_session, tmp_path_factory):
    """One deterministic corpus written as 5 files; A = first 3 files,
    B = last 2 — docID enumeration of (A then B) equals the full corpus."""
    d = str(tmp_path_factory.mktemp("ext_corpus"))
    paths = write_corpus_parquet(d, 400, n_files=5)
    return d, paths[:3], paths[3:]


def _assert_identical(e_inc, e_full, modes=("disjunctive", "conjunctive")):
    for q in make_queries():
        for mode in modes:
            got = e_inc.search(q["query"], mode, q["k"])
            want = e_full.search(q["query"], mode, q["k"])
            assert got == want, (q["query"], mode)


def test_extend_doc_layout_matches_full_rebuild(
    ray_session, split_corpus, tmp_path_factory
):
    corpus_dir, a_files, b_files = split_corpus
    full = str(tmp_path_factory.mktemp("full_doc"))
    inc = str(tmp_path_factory.mktemp("inc_doc"))
    build_index(corpus_dir, full, BuildConfig(num_partitions=4, partition_by="doc"))
    build_index(a_files, inc, BuildConfig(num_partitions=2, partition_by="doc"))
    manifest = extend_index(inc, b_files)

    e_full = SearchEngine(full)
    e_inc = SearchEngine(inc)
    assert e_inc.N == e_full.N
    assert e_inc.avgdl == e_full.avgdl
    assert e_inc.stats == e_full.stats
    _assert_identical(e_inc, e_full)

    # delta went into brand-new partitions; base part dirs untouched
    assert manifest["extensions"][0]["parts"], "doc extension must add parts"
    assert min(manifest["extensions"][0]["parts"]) >= 2

    # base parts' baked bounds are stale -> pruned mode silently serves
    # exhaustive; results still identical to the full rebuild's pruned mode
    assert e_inc._stale_ubs and not e_full._stale_ubs
    _assert_identical(e_inc, e_full, modes=("disjunctive_pruned",))

    # refresh_bounds re-encodes with the new stats: flag cleared, pruned
    # runs for real, results unchanged
    refresh_bounds(inc)
    e_ref = SearchEngine(inc)
    assert not e_ref._stale_ubs
    _assert_identical(e_ref, e_full, modes=("disjunctive_pruned",))


def test_extend_doc_layout_sharded(ray_session, split_corpus, tmp_path_factory):
    """The sharded engine over an extended index must use the manifest's
    explicit doc ranges (the formula no longer applies at the new N)."""
    from wse_ray.query.sharded import ShardedSearchEngine

    corpus_dir, a_files, b_files = split_corpus
    full = str(tmp_path_factory.mktemp("full_doc_s"))
    inc = str(tmp_path_factory.mktemp("inc_doc_s"))
    build_index(corpus_dir, full, BuildConfig(num_partitions=4, partition_by="doc"))
    build_index(a_files, inc, BuildConfig(num_partitions=3, partition_by="doc"))
    extend_index(inc, b_files)

    e_full = SearchEngine(full)
    sharded = ShardedSearchEngine(inc)
    # explicit ranges must tile [0, N) without gaps or overlaps
    spans = sorted(sharded.doc_ranges)
    assert spans[0][0] == 0 and spans[-1][1] == e_full.N
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi == b_lo
    for q in make_queries()[:12]:
        got = sharded.search(q["query"], q["mode"], q["k"])
        want = e_full.search(q["query"], q["mode"], q["k"])
        assert got == want, q["query"]


def test_extend_term_layout_matches_full_rebuild(
    ray_session, split_corpus, tmp_path_factory
):
    """Term layout: O(delta) append-only generations — the delta exchanges
    into BRAND-NEW partitions (same term-hash routing, offset ids), base
    partitions stay byte-identical (never read, never re-encoded), a term's
    per-generation segments are docID-disjoint and merge in the scorer, and
    stale_ubs gates pruning until refresh_bounds re-bakes the bounds."""
    import glob as _glob

    corpus_dir, a_files, b_files = split_corpus
    full = str(tmp_path_factory.mktemp("full_term"))
    inc = str(tmp_path_factory.mktemp("inc_term"))
    cfg = BuildConfig(num_partitions=4, heavy_df_threshold=50, heavy_subparts=2)
    build_index(corpus_dir, full, cfg)
    build_index(a_files, inc, cfg)

    def _part_sig(root):
        out = {}
        for d in _glob.glob(os.path.join(root, "parts", "part=*")):
            files = sorted(_glob.glob(os.path.join(d, "*")))
            out[os.path.basename(d)] = [
                (os.path.basename(f), os.stat(f).st_size, os.stat(f).st_mtime_ns)
                for f in files
            ]
        return out

    before = _part_sig(inc)
    manifest = extend_index(inc, b_files)
    after = _part_sig(inc)

    new_parts = {f"part={p:05d}" for p in manifest["extensions"][0]["parts"]}
    assert new_parts, "term extension must add generation partitions"
    assert set(before).isdisjoint(new_parts)
    for p in before:  # base partitions byte-identical incl. mtime
        assert after[p] == before[p], p
    assert set(after) == set(before) | new_parts

    e_full = SearchEngine(full)
    e_inc = SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    assert e_inc._stale_ubs  # base partitions carry old-stats bounds
    _assert_identical(
        e_inc, e_full, modes=("disjunctive", "conjunctive", "disjunctive_pruned")
    )
    refresh_bounds(inc)
    e_ref = SearchEngine(inc)
    assert not e_ref._stale_ubs
    _assert_identical(e_ref, e_full, modes=("disjunctive_pruned",))


def test_extend_term_layout_second_generation(ray_session, tmp_path_factory):
    """Two term-layout generations: partition ids keep advancing, a term's
    three segments (base + 2 gens) merge exactly."""
    d = str(tmp_path_factory.mktemp("term3_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    full = str(tmp_path_factory.mktemp("term3_full"))
    inc = str(tmp_path_factory.mktemp("term3_inc"))
    cfg = BuildConfig(num_partitions=3, heavy_df_threshold=50, heavy_subparts=2)
    build_index(d, full, cfg)
    build_index(paths[:2], inc, cfg)
    extend_index(inc, paths[2:4])
    manifest = extend_index(inc, paths[4:])
    g1, g2 = manifest["extensions"]
    assert g1["parts"] and g2["parts"]
    assert min(g2["parts"]) > max(g1["parts"])

    e_full = SearchEngine(full)
    e_inc = SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    _assert_identical(e_inc, e_full)


def test_extend_second_generation(ray_session, tmp_path_factory):
    """Two successive extensions equal one full rebuild of all three
    batches (generation folding of stats + ranges)."""
    d = str(tmp_path_factory.mktemp("ext3_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    full = str(tmp_path_factory.mktemp("full3"))
    inc = str(tmp_path_factory.mktemp("inc3"))
    build_index(d, full, BuildConfig(num_partitions=4, partition_by="doc"))
    build_index(paths[:2], inc, BuildConfig(num_partitions=2, partition_by="doc"))
    extend_index(inc, paths[2:4])
    manifest = extend_index(inc, paths[4:])
    assert [e["gen"] for e in manifest["extensions"]] == [1, 2]

    e_full = SearchEngine(full)
    e_inc = SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    _assert_identical(e_inc, e_full)


def test_extend_resume_and_corpus_guard(ray_session, tmp_path_factory):
    """An interrupted extension resumes idempotently when re-called with
    the same corpus, and refuses a different corpus mid-generation."""
    d = str(tmp_path_factory.mktemp("extr_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    inc = str(tmp_path_factory.mktemp("incr"))
    build_index(paths[:2], inc, BuildConfig(num_partitions=2, partition_by="doc"))
    extend_index(inc, paths[2:3])

    # simulate a crash after phase 2: wipe the later markers of gen 1
    gen_dir = os.path.join(inc, "ext_gen001")
    os.remove(os.path.join(gen_dir, "phase_parts.done"))
    os.remove(os.path.join(gen_dir, "done"))
    with open(os.path.join(inc, "manifest.json")) as f:
        m = json.load(f)
    m["extensions"] = []  # manifest write happens last; crash lost it
    with open(os.path.join(inc, "manifest.json"), "w") as f:
        json.dump(m, f)

    # a DIFFERENT corpus mid-generation must be refused
    with pytest.raises(ValueError, match="different corpus"):
        extend_index(inc, paths[3:])

    # same corpus resumes; results equal a clean two-batch build
    extend_index(inc, paths[2:3])
    full = str(tmp_path_factory.mktemp("fullr"))
    build_index(paths[:3], full, BuildConfig(num_partitions=2, partition_by="doc"))
    e_inc, e_full = SearchEngine(inc), SearchEngine(full)
    assert e_inc.stats == e_full.stats
    for q in make_queries()[:10]:
        assert e_inc.search(q["query"], q["mode"], q["k"]) == e_full.search(
            q["query"], q["mode"], q["k"]
        )


def test_delete_docs_tombstones(ray_session, tmp_path_factory):
    """Tombstoned docs vanish from every mode's results (matches AND the
    zero-pad pool), surviving docs keep their exact scores (stored stats),
    sharded serving agrees with single-node, and the delete is idempotent."""
    import shutil

    from wse_ray.index.extend import delete_docs
    from wse_ray.query.sharded import ShardedSearchEngine

    d = str(tmp_path_factory.mktemp("del_corpus"))
    write_corpus_parquet(d, 300, n_files=3)
    base = str(tmp_path_factory.mktemp("del_base"))
    build_index(d, base, BuildConfig(num_partitions=3, partition_by="doc"))
    live = SearchEngine(base)

    deleted = [i for i in range(300) if i % 7 == 0]
    idx = str(tmp_path_factory.mktemp("del_idx"))
    shutil.rmtree(idx)
    shutil.copytree(base, idx)
    n1 = delete_docs(idx, deleted)
    n2 = delete_docs(idx, deleted)  # idempotent: same file, same count
    assert n1 == n2 == len(deleted)
    eng = SearchEngine(idx)
    dead = set(deleted)

    for q in make_queries():
        for mode in ("disjunctive", "conjunctive", "disjunctive_pruned"):
            res = eng.search(q["query"], mode, q["k"])
            assert not ({doc for doc, _ in res} & dead), (q["query"], mode)
            # surviving docs keep the exact live-engine score
            live_scores = dict(live.search(q["query"], mode, 300))
            for doc, score in res:
                if doc in live_scores:
                    assert score == live_scores[doc]

    # zero-padding skips tombstones: an absent term pads from survivors
    pad = eng.search("zzz_absent_term", "disjunctive", 10)
    assert [doc for doc, _ in pad] == [i for i in range(15) if i % 7 != 0][:10]
    assert all(s == 0.0 for _, s in pad)

    sharded = ShardedSearchEngine(idx)
    for q in make_queries()[:10]:
        assert sharded.search(q["query"], q["mode"], q["k"]) == eng.search(
            q["query"], q["mode"], q["k"]
        )


def test_delete_then_extend(ray_session, tmp_path_factory):
    """Tombstones and extension compose: delete from the base generation,
    extend with new docs — deleted stay gone, new docs are served."""
    from wse_ray.index.extend import delete_docs, extend_index

    d = str(tmp_path_factory.mktemp("delx_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    idx = str(tmp_path_factory.mktemp("delx_idx"))
    build_index(paths[:2], idx, BuildConfig(num_partitions=2, partition_by="doc"))
    delete_docs(idx, [0, 1, 2])
    extend_index(idx, paths[2:])
    eng = SearchEngine(idx)
    assert eng.N == 200  # stats count tombstoned docs until compaction
    for q in make_queries()[:10]:
        res = eng.search(q["query"], q["mode"], q["k"])
        assert not ({doc for doc, _ in res} & {0, 1, 2})
    # new-generation docs are reachable
    hits = {doc for doc, _ in eng.search("zzz_absent_term", "disjunctive", 200)}
    assert hits & set(range(100, 200))


def test_compact_equals_fresh_build_without_deleted(ray_session, tmp_path_factory):
    """compact_index(idx with tombstones) must serve exactly like a fresh
    build over the corpus with the deleted docs removed (dense docID
    renumbering, recomputed stats/dfs/bounds, tombstones reset)."""
    import pyarrow.parquet as pq

    from wse_ray.fixtures import make_corpus
    from wse_ray.index.extend import compact_index, delete_docs

    n, dead = 300, set(range(0, 300, 7))
    corpus_dir = str(tmp_path_factory.mktemp("cmp_corpus"))
    write_corpus_parquet(corpus_dir, n, n_files=3)
    # reference: corpus with the deleted docs REMOVED, order preserved
    t = make_corpus(n)
    keep_mask = [i not in dead for i in range(n)]
    filt_dir = str(tmp_path_factory.mktemp("cmp_filtered"))
    pq.write_table(
        t.filter(keep_mask), os.path.join(filt_dir, "corpus-00000.parquet")
    )

    idx = str(tmp_path_factory.mktemp("cmp_idx"))
    cfg = BuildConfig(num_partitions=3)
    build_index(corpus_dir, idx, cfg)
    delete_docs(idx, sorted(dead))
    out = str(tmp_path_factory.mktemp("cmp_out"))
    compact_index(idx, out, cfg)

    ref = str(tmp_path_factory.mktemp("cmp_ref"))
    build_index(filt_dir, ref, cfg)

    e_cmp, e_ref = SearchEngine(out), SearchEngine(ref)
    assert e_cmp.stats == e_ref.stats
    assert len(e_cmp._deleted) == 0  # tombstones reset
    for q in make_queries():
        for mode in ("disjunctive", "conjunctive", "disjunctive_pruned"):
            assert e_cmp.search(q["query"], mode, q["k"]) == e_ref.search(
                q["query"], mode, q["k"]
            ), (q["query"], mode)


def test_extend_from_html_delta(ray_session, tmp_path_factory):
    """An html-only delta batch extends through the byte-exact extraction
    stage and serves identically to extending with the text column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from wse_ray.fixtures import make_corpus
    from wse_ray.index.extend import extend_index

    d = str(tmp_path_factory.mktemp("html_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    # html-wrapped copy of the delta files (text column dropped)
    t = make_corpus(200)
    html_dir = str(tmp_path_factory.mktemp("html_delta"))
    delta = t.slice(100, 100)
    htmls = [
        b"<html><head></head><body>" + tx.as_py().encode() + b"</body></html>"
        for tx in delta["text"]
    ]
    pq.write_table(
        pa.table({"url": delta["url"], "html": pa.array(htmls, pa.large_binary())}),
        os.path.join(html_dir, "corpus-00000.parquet"),
    )

    ref = str(tmp_path_factory.mktemp("html_ref"))
    build_index(paths[:2], ref, BuildConfig(num_partitions=2, partition_by="doc"))
    extend_index(ref, paths[2:])

    inc = str(tmp_path_factory.mktemp("html_inc"))
    build_index(paths[:2], inc, BuildConfig(num_partitions=2, partition_by="doc"))
    extend_index(inc, html_dir, from_html=True)

    e_ref, e_inc = SearchEngine(ref), SearchEngine(inc)
    assert e_inc.stats == e_ref.stats
    for q in make_queries()[:10]:
        assert e_inc.search(q["query"], q["mode"], q["k"]) == e_ref.search(
            q["query"], q["mode"], q["k"]
        )


def test_stale_ubs_visible_before_new_stats(ray_session, tmp_path_factory, monkeypatch):
    """Crash-window soundness: if a doc-layout extension dies AFTER the new
    stats are published but before completion, the manifest must already
    carry stale_ubs=true so pruned mode falls back (stale chunk bounds at
    the new N are not sound upper bounds)."""
    import wse_ray.index.extend as ext

    d = str(tmp_path_factory.mktemp("crash_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    idx = str(tmp_path_factory.mktemp("crash_idx"))
    build_index(paths[:2], idx, BuildConfig(num_partitions=2, partition_by="doc"))

    class Boom(RuntimeError):
        pass

    def exploding_assigner(*a, **k):
        raise Boom("simulated crash between phase 1 and phase 2")

    monkeypatch.setattr(ext, "_AssignDeltaPartByDoc", exploding_assigner)
    with pytest.raises(Boom):
        ext.extend_index(idx, paths[2:])

    with open(os.path.join(idx, "stats.json")) as f:
        assert json.load(f)["N"] == 200  # new stats already visible...
    with open(os.path.join(idx, "manifest.json")) as f:
        assert json.load(f)["stale_ubs"] is True  # ...so the gate is too
    assert SearchEngine(idx)._stale_ubs

    monkeypatch.undo()
    ext.extend_index(idx, paths[2:])  # resume completes normally
    full = str(tmp_path_factory.mktemp("crash_full"))
    build_index(d, full, BuildConfig(num_partitions=2, partition_by="doc"))
    e_inc, e_full = SearchEngine(idx), SearchEngine(full)
    for q in make_queries()[:8]:
        assert e_inc.search(q["query"], q["mode"], q["k"]) == e_full.search(
            q["query"], q["mode"], q["k"]
        )


def test_resume_reuses_stamped_delta_partitions(ray_session, tmp_path_factory):
    """A resume must reuse the generation's stamped delta_partitions (a
    default-recomputed value on retry cannot orphan routed partitions),
    and a CONFLICTING explicit value is refused."""
    from wse_ray.index.extend import extend_index

    d = str(tmp_path_factory.mktemp("dp_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    idx = str(tmp_path_factory.mktemp("dp_idx"))
    build_index(paths[:2], idx, BuildConfig(num_partitions=2, partition_by="doc"))
    extend_index(idx, paths[2:], delta_partitions=3)

    # simulate a crash after phase 2: retry WITHOUT the explicit value
    gen_dir = os.path.join(idx, "ext_gen001")
    os.remove(os.path.join(gen_dir, "phase_parts.done"))
    os.remove(os.path.join(gen_dir, "done"))
    with open(os.path.join(idx, "manifest.json")) as f:
        m = json.load(f)
    m["extensions"] = []
    with open(os.path.join(idx, "manifest.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="delta_partitions"):
        extend_index(idx, paths[2:], delta_partitions=5)
    manifest = extend_index(idx, paths[2:])  # default: reuses the stamp
    assert len(manifest["extensions"][0]["parts"]) == 3

    full = str(tmp_path_factory.mktemp("dp_full"))
    build_index(d, full, BuildConfig(num_partitions=2, partition_by="doc"))
    e_inc, e_full = SearchEngine(idx), SearchEngine(full)
    for q in make_queries()[:8]:
        assert e_inc.search(q["query"], q["mode"], q["k"]) == e_full.search(
            q["query"], q["mode"], q["k"]
        )


def test_callable_delta_docid_guards(ray_session, tmp_path_factory):
    """A callable delta corpus with wrong docIDs is rejected: a floor
    violation fails INSIDE the tokenize map, before any run file could
    clobber base/earlier-generation files (which must survive untouched);
    a gap-shifted range (count right, endpoints wrong) fails the
    contiguity check; a correct retry then completes normally."""
    import shutil

    import pyarrow as pa
    import ray.data

    from wse_ray.fixtures import make_corpus
    from wse_ray.index.extend import extend_index

    d = str(tmp_path_factory.mktemp("guard_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    idx = str(tmp_path_factory.mktemp("guard_idx"))
    build_index(paths[:2], idx, BuildConfig(num_partitions=2, partition_by="doc"))

    t = make_corpus(200)

    def corpus_with_ids(lo_id):
        def corpus():
            tt = t.slice(100, 100).append_column(
                "docID", pa.array(range(lo_id, lo_id + 100), pa.uint64())
            )
            return ray.data.from_arrow(tt)

        return corpus

    def runs_sig():
        rd = os.path.join(idx, "runs")
        return {
            f: (os.stat(os.path.join(rd, f)).st_size,
                os.stat(os.path.join(rd, f)).st_mtime_ns)
            for f in os.listdir(rd)
            if f.endswith(".parquet")
        }

    gen_dir = os.path.join(idx, "ext_gen001")
    before = runs_sig()

    # 1. floor violation: docIDs collide with the base range [0, 100)
    with pytest.raises(Exception, match="extension floor"):
        extend_index(idx, corpus_with_ids(0))
    assert runs_sig() == before  # base run files byte-untouched
    shutil.rmtree(gen_dir)  # abandon the failed generation

    # 2. gap-shifted range: right count, docIDs start at n_before + 10
    with pytest.raises(ValueError, match="contiguous"):
        extend_index(idx, corpus_with_ids(110))
    assert {f for f in runs_sig()} - set(before) <= {
        f for f in runs_sig() if int(f[len("run-"):-len(".parquet")]) >= 100
    }  # only delta-range files were written
    shutil.rmtree(gen_dir)

    # 3. correct retry completes and matches the full rebuild
    extend_index(idx, corpus_with_ids(100))
    full = str(tmp_path_factory.mktemp("guard_full"))
    build_index(d, full, BuildConfig(num_partitions=2, partition_by="doc"))
    e_inc, e_full = SearchEngine(idx), SearchEngine(full)
    assert e_inc.stats == e_full.stats
    for q in make_queries()[:8]:
        assert e_inc.search(q["query"], q["mode"], q["k"]) == e_full.search(
            q["query"], q["mode"], q["k"]
        )


def test_callable_fingerprint_distinguishes_defaults(ray_session):
    """Two callables from the same factory differing only via __defaults__
    / __kwdefaults__ must fingerprint differently (the mid-generation
    corpus guard keys on the fingerprint)."""
    from wse_ray.index.extend import _corpus_fingerprint

    def factory(lo):
        def corpus(lo=lo):
            return lo

        return corpus

    def factory_kw(lo):
        def corpus(*, lo=lo):
            return lo

        return corpus

    assert _corpus_fingerprint(factory(1)) != _corpus_fingerprint(factory(2))
    assert _corpus_fingerprint(factory_kw(1)) != _corpus_fingerprint(factory_kw(2))
    assert _corpus_fingerprint(factory(1)) == _corpus_fingerprint(factory(1))


def test_callable_delta_rejects_duplicate_docids(ray_session, tmp_path_factory):
    """Count + endpoints alone would accept [100,101,101,103]; the per-file
    uniqueness / disjoint-range check must reject duplicates."""
    import pyarrow as pa
    import ray.data

    from wse_ray.fixtures import make_corpus
    from wse_ray.index.extend import extend_index

    d = str(tmp_path_factory.mktemp("dup_corpus"))
    paths = write_corpus_parquet(d, 104, n_files=2)
    idx = str(tmp_path_factory.mktemp("dup_idx"))
    build_index(paths[:1], idx, BuildConfig(num_partitions=2, partition_by="doc"))
    n_before = SearchEngine(idx).N
    t = make_corpus(104)

    def corpus():
        ids = [n_before, n_before + 1, n_before + 1, n_before + 3]
        tt = t.slice(52, 4).append_column("docID", pa.array(ids, pa.uint64()))
        return ray.data.from_arrow(tt)

    with pytest.raises(ValueError, match="duplicate|overlap"):
        extend_index(idx, corpus)


def test_orphaned_generation_is_swept(ray_session, tmp_path_factory):
    """An abandoned generation's exchanged postings (gen_dir removed per
    the mid-flight error advice) must not survive into the next
    generation's part ids or into refresh_bounds' encode set."""
    import shutil as _sh

    from wse_ray.index.extend import _live_max_part, refresh_bounds
    import json as _json

    d = str(tmp_path_factory.mktemp("orph_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    idx = str(tmp_path_factory.mktemp("orph_idx"))
    cfg = BuildConfig(num_partitions=3, heavy_df_threshold=50, heavy_subparts=2)
    build_index(paths[:2], idx, cfg)

    with open(os.path.join(idx, "manifest.json")) as f:
        manifest = _json.load(f)
    live_max = _live_max_part(manifest, cfg)

    # fake an abandoned generation: orphan postings + parts dirs above the
    # live ceiling, gen_dir already removed (id far above the next
    # generation's legitimate range so sweep vs re-create is unambiguous)
    orphan = live_max + 500
    os.makedirs(os.path.join(idx, "postings", f"part={orphan}"))
    import pyarrow as pa
    import pyarrow.parquet as _pq

    _pq.write_table(
        pa.table({"term": pa.array([b"zzz"], pa.large_binary()),
                  "docID": pa.array([0], pa.uint64()),
                  "tf": pa.array([1], pa.uint64()),
                  "dl": pa.array([10], pa.uint64())}),
        os.path.join(idx, "postings", f"part={orphan}", "orphan.parquet"),
    )

    manifest2 = extend_index(idx, paths[2:4])
    # the new generation's ids must come from the MANIFEST ceiling, not the
    # filesystem max (which the orphan inflated)
    assert min(manifest2["extensions"][0]["parts"]) == live_max + 1
    # the orphan dir was swept at fresh-generation start
    assert not os.path.isdir(os.path.join(idx, "postings", f"part={orphan}"))

    # refresh_bounds only touches manifest-live partitions
    refresh_bounds(idx)
    parts = {
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(idx, "parts", "part=*"))
    }
    assert orphan not in parts

    full = str(tmp_path_factory.mktemp("orph_full"))
    build_index(paths[:4], full, cfg)
    e_inc, e_full = SearchEngine(idx), SearchEngine(full)
    assert e_inc.stats == e_full.stats
    for q in make_queries()[:8]:
        for mode in ("disjunctive", "conjunctive", "disjunctive_pruned"):
            assert e_inc.search(q["query"], mode, q["k"]) == e_full.search(
                q["query"], mode, q["k"]
            )
    _sh.rmtree(idx, ignore_errors=True)


def test_refresh_bounds_two_rename_fallback(ray_session, tmp_path_factory, monkeypatch):
    """Filesystems without renameat2(RENAME_EXCHANGE) take the two-rename
    fallback; results must be identical."""
    import wse_ray.index.extend as ext

    monkeypatch.setattr(ext, "_exchange_paths", lambda a, b: False)
    d = str(tmp_path_factory.mktemp("fb_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    idx = str(tmp_path_factory.mktemp("fb_idx"))
    build_index(paths[:2], idx, BuildConfig(num_partitions=2, partition_by="doc"))
    ext.extend_index(idx, paths[2:])
    refresh_bounds(idx)
    full = str(tmp_path_factory.mktemp("fb_full"))
    build_index(d, full, BuildConfig(num_partitions=2, partition_by="doc"))
    e_inc, e_full = SearchEngine(idx), SearchEngine(full)
    assert not e_inc._stale_ubs
    for q in make_queries()[:8]:
        for mode in ("disjunctive", "disjunctive_pruned"):
            assert e_inc.search(q["query"], mode, q["k"]) == e_full.search(
                q["query"], mode, q["k"]
            )


def test_refresh_bounds_crash_after_exchange_reencodes(
    ray_session, tmp_path_factory, monkeypatch
):
    """ADVICE r4 (extend.py:170): a crash right after RENAME_EXCHANGE —
    before the old encode is moved to trash and the swap marker lands —
    parks the OLD encode in staging.  The resume must re-encode it (the
    fix strips the live dir's _SUCCESS pre-exchange), never re-swap
    stale-stats bounds back live; the finished index must be byte-equal
    to a crash-free refresh."""
    import shutil as _sh

    import wse_ray.index.extend as ext

    d = str(tmp_path_factory.mktemp("crash_corpus"))
    paths = write_corpus_parquet(d, 200, n_files=4)
    idx = str(tmp_path_factory.mktemp("crash_idx")) + "/idx"
    build_index(paths[:2], idx, BuildConfig(num_partitions=2, partition_by="doc"))
    ext.extend_index(idx, paths[2:])

    # control: identical index refreshed without a crash
    ctrl = idx + "_ctrl"
    _sh.copytree(idx, ctrl)
    refresh_bounds(ctrl)

    real_ex = ext._exchange_paths
    crashed = []

    def crash_after_exchange(a, b):
        assert real_ex(a, b), "sandbox kernel supports RENAME_EXCHANGE"
        crashed.append(a)
        raise RuntimeError("simulated crash right after RENAME_EXCHANGE")

    monkeypatch.setattr(ext, "_exchange_paths", crash_after_exchange)
    with pytest.raises(RuntimeError, match="simulated crash"):
        refresh_bounds(idx)
    monkeypatch.setattr(ext, "_exchange_paths", real_ex)

    # the fix's invariant: the OLD encode now sitting in staging carries
    # NO _SUCCESS, so the resume re-encodes instead of re-swapping it
    assert crashed and os.path.isdir(crashed[0])
    assert not os.path.exists(os.path.join(crashed[0], "_SUCCESS"))

    assert json.load(open(os.path.join(idx, "manifest.json")))["stale_ubs"]
    refresh_bounds(idx)
    assert not json.load(open(os.path.join(idx, "manifest.json")))["stale_ubs"]
    assert not glob.glob(os.path.join(idx, "bounds_refresh_N*"))

    # byte-equality with the crash-free control, per part file
    for cd in sorted(glob.glob(os.path.join(ctrl, "parts", "part=*"))):
        pd = os.path.join(idx, "parts", os.path.basename(cd))
        for fname in ("postings.bin", "lexicon.parquet"):
            with open(os.path.join(cd, fname), "rb") as f1, open(
                os.path.join(pd, fname), "rb"
            ) as f2:
                assert f1.read() == f2.read(), (cd, fname)

    e_inc = SearchEngine(idx)
    e_ctrl = SearchEngine(ctrl)
    assert not e_inc._stale_ubs
    for q in make_queries()[:8]:
        for mode in ("disjunctive", "disjunctive_pruned"):
            assert e_inc.search(q["query"], mode, q["k"]) == e_ctrl.search(
                q["query"], mode, q["k"]
            )


def test_refresh_bounds_sweeps_leaked_staging_on_early_return(
    ray_session, tmp_path_factory
):
    """ADVICE r4 (extend.py:856): a refresh that crashed after clearing
    stale_ubs but before its cleanup glob leaves bounds_refresh_N* dirs;
    the next (no-op) refresh_bounds call must sweep them."""
    d = str(tmp_path_factory.mktemp("sweep_corpus"))
    paths = write_corpus_parquet(d, 100, n_files=2)
    idx = str(tmp_path_factory.mktemp("sweep_idx"))
    build_index(paths, idx, BuildConfig(num_partitions=2, partition_by="doc"))
    leaked = os.path.join(idx, "bounds_refresh_N999", "parts", "part=00000")
    os.makedirs(leaked)
    refresh_bounds(idx)  # stale_ubs unset -> early return, but must sweep
    assert not glob.glob(os.path.join(idx, "bounds_refresh_N*"))


def _search_all(eng, k=10, nq=10):
    out = []
    for q in make_queries()[:nq]:
        for mode in ("disjunctive", "conjunctive"):
            out.append((q["query"], mode, eng.search(q["query"], mode, k)))
    return out


def test_consolidate_generations_bit_identical(ray_session, tmp_path_factory):
    """Three term-layout generations -> consolidate -> ONE merged
    generation; results bit-identical to the full rebuild, old generation
    partitions gone, base partitions byte-untouched."""
    import glob as _glob

    from wse_ray.index.extend import consolidate_generations

    d = str(tmp_path_factory.mktemp("cons_corpus"))
    paths = write_corpus_parquet(d, 400, n_files=8)
    full = str(tmp_path_factory.mktemp("cons_full"))
    inc = str(tmp_path_factory.mktemp("cons_inc"))
    cfg = BuildConfig(num_partitions=4, heavy_df_threshold=60, heavy_subparts=2)
    build_index(d, full, cfg)
    build_index(paths[:5], inc, cfg)
    for i in (5, 6, 7):
        extend_index(inc, [paths[i]])
    manifest = json.load(open(os.path.join(inc, "manifest.json")))
    assert len(manifest["extensions"]) == 3
    old_gen_parts = {p for e in manifest["extensions"] for p in e["parts"]}

    base_ids = {
        int(os.path.basename(p).split("=")[1])
        for p in _glob.glob(os.path.join(inc, "parts", "part=*"))
    } - old_gen_parts

    def base_sig():
        out = {}
        for pid in base_ids:
            d2 = os.path.join(inc, "parts", f"part={pid:05d}")
            for f in sorted(os.listdir(d2)):
                st = os.stat(os.path.join(d2, f))
                out[(pid, f)] = (st.st_size, st.st_mtime_ns)
        return out

    before_sig = base_sig()
    e_full = SearchEngine(full)
    want = _search_all(e_full)

    manifest = consolidate_generations(inc)
    assert len(manifest["extensions"]) == 1
    merged = manifest["extensions"][0]
    assert merged["consolidated_from"] == [1, 2, 3]
    assert merged["delta_stats"]["n"] == 150  # 3 x 50-doc files
    live_ids = {
        int(os.path.basename(p).split("=")[1])
        for p in _glob.glob(os.path.join(inc, "parts", "part=*"))
    }
    assert not (live_ids & old_gen_parts), "old generation parts must be gone"
    assert set(merged["parts"]) <= live_ids
    assert base_sig() == before_sig  # base parts byte-untouched
    # no leftover journal/work
    assert not os.path.exists(os.path.join(inc, "consolidate_pending.json"))
    assert not os.path.exists(os.path.join(inc, "consolidate_work"))

    e_inc = SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    got = _search_all(e_inc)
    assert got == want
    # merged generation is encoded at the CURRENT stats -> refresh_bounds
    # skips it (fresh set) and pruned mode works after refresh
    refresh_bounds(inc)
    assert _search_all(SearchEngine(inc)) == want

    # idempotent no-op on a single remaining generation
    assert len(consolidate_generations(inc)["extensions"]) == 1


def test_extend_max_generations_auto_consolidates(
    ray_session, tmp_path_factory
):
    """The max_generations knob: the 3rd extension over the cap triggers
    consolidation inside extend_index; serving equals the full rebuild."""
    d = str(tmp_path_factory.mktemp("maxg_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    full = str(tmp_path_factory.mktemp("maxg_full"))
    inc = str(tmp_path_factory.mktemp("maxg_inc"))
    cfg = BuildConfig(num_partitions=3)
    build_index(d, full, cfg)
    build_index(paths[:3], inc, cfg)
    for i in (3, 4, 5):
        manifest = extend_index(inc, [paths[i]], max_generations=2)
    assert len([e for e in manifest["extensions"] if e["parts"]]) <= 2
    e_full, e_inc = SearchEngine(full), SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    assert _search_all(e_inc) == _search_all(e_full)


def test_consolidate_crash_resume(ray_session, tmp_path_factory, monkeypatch):
    """A crash mid-consolidation (after the first slot commit) must resume
    through the journal — from extend_index's entry hook — to the same
    final state."""
    import wse_ray.index.extend as ext

    d = str(tmp_path_factory.mktemp("cc_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    full = str(tmp_path_factory.mktemp("cc_full"))
    inc = str(tmp_path_factory.mktemp("cc_inc"))
    cfg = BuildConfig(num_partitions=3)
    build_index(d, full, cfg)
    build_index(paths[:3], inc, cfg)
    extend_index(inc, [paths[3]])
    extend_index(inc, [paths[4]])

    real_touch = ext._touch
    seen = []

    def crashing_touch(path):
        if "slot-" in os.path.basename(path):
            seen.append(path)
            if len(seen) == 2:
                raise RuntimeError("simulated crash mid-consolidation")
        real_touch(path)

    monkeypatch.setattr(ext, "_touch", crashing_touch)
    with pytest.raises(RuntimeError, match="mid-consolidation"):
        ext.consolidate_generations(inc)
    monkeypatch.setattr(ext, "_touch", real_touch)
    assert os.path.exists(os.path.join(inc, "consolidate_pending.json"))

    # resume happens implicitly on the next extension
    extend_index(inc, [paths[5]])
    manifest = json.load(open(os.path.join(inc, "manifest.json")))
    kinds = [e.get("consolidated_from") for e in manifest["extensions"]]
    assert any(k == [1, 2] for k in kinds), kinds
    assert not os.path.exists(os.path.join(inc, "consolidate_pending.json"))
    e_full, e_inc = SearchEngine(full), SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    assert _search_all(e_inc) == _search_all(e_full)


def test_double_consolidation_slot_aligned(ray_session, tmp_path_factory):
    """Consolidate, extend more, consolidate again: the recorded part0
    keeps slot arithmetic exact for the previously-merged generation, so
    the second merge stays within the base slot width (never more merged
    partitions than partition slots) and serving equals the full
    rebuild."""
    from wse_ray.index.extend import consolidate_generations

    d = str(tmp_path_factory.mktemp("dc_corpus"))
    paths = write_corpus_parquet(d, 350, n_files=7)
    full = str(tmp_path_factory.mktemp("dc_full"))
    inc = str(tmp_path_factory.mktemp("dc_inc"))
    cfg = BuildConfig(num_partitions=3, heavy_df_threshold=60, heavy_subparts=2)
    build_index(d, full, cfg)
    build_index(paths[:3], inc, cfg)
    for i in (3, 4):
        extend_index(inc, [paths[i]])
    m1 = consolidate_generations(inc)
    assert len(m1["extensions"]) == 1
    for i in (5, 6):
        extend_index(inc, [paths[i]])
    m2 = consolidate_generations(inc)
    assert len(m2["extensions"]) == 1
    merged = m2["extensions"][0]
    manifest = json.load(open(os.path.join(inc, "manifest.json")))
    width = cfg.num_partitions + manifest.get("heavy_terms", 0) * cfg.heavy_subparts
    assert len(merged["parts"]) <= width, (merged["parts"], width)
    assert min(merged["parts"]) >= merged["part0"]
    e_full, e_inc = SearchEngine(full), SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    assert _search_all(e_inc) == _search_all(e_full)


def test_consolidate_doc_layout(ray_session, tmp_path_factory):
    """Doc layout: three small shard generations merge into right-sized
    partitions; doc_ranges re-tile [0, N) exactly, single-node AND
    sharded serving equal the full rebuild, old shard dirs are gone."""
    import glob as _glob

    from wse_ray.index.extend import consolidate_generations
    from wse_ray.query.sharded import ShardedSearchEngine

    d = str(tmp_path_factory.mktemp("cdoc_corpus"))
    paths = write_corpus_parquet(d, 400, n_files=8)
    full = str(tmp_path_factory.mktemp("cdoc_full"))
    inc = str(tmp_path_factory.mktemp("cdoc_inc"))
    build_index(d, full, BuildConfig(num_partitions=4, partition_by="doc"))
    build_index(paths[:5], inc, BuildConfig(num_partitions=2, partition_by="doc"))
    for i in (5, 6, 7):
        extend_index(inc, [paths[i]])
    manifest = json.load(open(os.path.join(inc, "manifest.json")))
    assert len(manifest["extensions"]) == 3
    old_gen_parts = {p for e in manifest["extensions"] for p in e["parts"]}

    manifest = consolidate_generations(inc)
    assert len(manifest["extensions"]) == 1
    merged = manifest["extensions"][0]
    assert merged["consolidated_from"] == [1, 2, 3]
    assert merged["doc_lo"] == 250 and merged["doc_hi"] == 400
    live_ids = {
        int(os.path.basename(p).split("=")[1])
        for p in _glob.glob(os.path.join(inc, "parts", "part=*"))
    }
    assert not (live_ids & old_gen_parts)
    # merged shards sized like base ones (~125 docs/part) -> 2 parts
    assert len(merged["parts"]) <= 2
    # doc_ranges tile [0, 400) without gaps or overlaps
    spans = sorted(tuple(v) for v in manifest["doc_ranges"].values())
    assert spans[0][0] == 0 and spans[-1][1] == 400
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi == b_lo, spans

    e_full, e_inc = SearchEngine(full), SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    assert _search_all(e_inc) == _search_all(e_full)
    sharded = ShardedSearchEngine(inc)
    for q in make_queries()[:10]:
        assert sharded.search(q["query"], q["mode"], q["k"]) == e_full.search(
            q["query"], q["mode"], q["k"]
        ), q["query"]
    assert not os.path.exists(os.path.join(inc, "consolidate_pending.json"))
    assert not os.path.exists(os.path.join(inc, "consolidate_work"))


def test_consolidate_doc_crash_before_manifest_resumes(
    ray_session, tmp_path_factory, monkeypatch
):
    """Doc layout: a crash after the data commit but before the manifest
    write resumes through the journal (via extend_index's entry hook)."""
    import wse_ray.index.extend as ext

    d = str(tmp_path_factory.mktemp("cdc_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    full = str(tmp_path_factory.mktemp("cdc_full"))
    inc = str(tmp_path_factory.mktemp("cdc_inc"))
    build_index(d, full, BuildConfig(num_partitions=3, partition_by="doc"))
    build_index(paths[:3], inc, BuildConfig(num_partitions=2, partition_by="doc"))
    extend_index(inc, [paths[3]])
    extend_index(inc, [paths[4]])

    real_dump = ext._dump_json

    def crashing_dump(obj, path):
        if path.endswith("manifest.json") and any(
            "consolidated_from" in e for e in obj.get("extensions", [])
        ):
            raise RuntimeError("simulated crash before manifest commit")
        real_dump(obj, path)

    monkeypatch.setattr(ext, "_dump_json", crashing_dump)
    with pytest.raises(RuntimeError, match="manifest commit"):
        ext.consolidate_generations(inc)
    monkeypatch.setattr(ext, "_dump_json", real_dump)
    assert os.path.exists(os.path.join(inc, "consolidate_pending.json"))

    extend_index(inc, [paths[5]])  # entry hook finishes the consolidation
    manifest = json.load(open(os.path.join(inc, "manifest.json")))
    assert any(
        e.get("consolidated_from") == [1, 2] for e in manifest["extensions"]
    )
    e_full, e_inc = SearchEngine(full), SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    assert _search_all(e_inc) == _search_all(e_full)


def test_extend_doc_max_generations_auto_consolidates(
    ray_session, tmp_path_factory
):
    from wse_ray.query.sharded import ShardedSearchEngine

    d = str(tmp_path_factory.mktemp("mgd_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    full = str(tmp_path_factory.mktemp("mgd_full"))
    inc = str(tmp_path_factory.mktemp("mgd_inc"))
    build_index(d, full, BuildConfig(num_partitions=3, partition_by="doc"))
    build_index(paths[:3], inc, BuildConfig(num_partitions=2, partition_by="doc"))
    for i in (3, 4, 5):
        manifest = extend_index(inc, [paths[i]], max_generations=2)
    assert len([e for e in manifest["extensions"] if e["parts"]]) <= 2
    e_full, e_inc = SearchEngine(full), SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    assert _search_all(e_inc) == _search_all(e_full)
    sharded = ShardedSearchEngine(inc)
    for q in make_queries()[:8]:
        assert sharded.search(q["query"], q["mode"], q["k"]) == e_full.search(
            q["query"], q["mode"], q["k"]
        )


@pytest.mark.parametrize("layout", ["term", "doc"])
def test_mixed_lifecycle_with_consolidation(ray_session, tmp_path_factory, layout):
    """Interplay pin: extend -> delete -> extend -> extend with
    auto-consolidation -> refresh_bounds must serve exactly like a fresh
    build of the full corpus with the same docs tombstoned, in every
    mode.  (Tombstones are docID-keyed and consolidation preserves
    docIDs, so deletes must survive the merge.)"""
    from wse_ray.index.extend import delete_docs

    d = str(tmp_path_factory.mktemp(f"mix_{layout}_corpus"))
    paths = write_corpus_parquet(d, 350, n_files=7)
    full = str(tmp_path_factory.mktemp(f"mix_{layout}_full"))
    inc = str(tmp_path_factory.mktemp(f"mix_{layout}_inc"))
    kw = {} if layout == "term" else {"partition_by": "doc"}
    build_index(d, full, BuildConfig(num_partitions=3, **kw))
    build_index(paths[:4], inc, BuildConfig(num_partitions=3, **kw))
    extend_index(inc, [paths[4]])
    deleted = list(range(0, 350, 7))  # spans base + first generation
    delete_docs(inc, deleted)
    extend_index(inc, [paths[5]])
    manifest = extend_index(inc, [paths[6]], max_generations=2)
    assert any("consolidated_from" in e for e in manifest["extensions"])
    refresh_bounds(inc)
    delete_docs(full, deleted)

    e_full, e_inc = SearchEngine(full), SearchEngine(inc)
    assert e_inc.stats == e_full.stats
    for q in make_queries()[:12]:
        for mode in ("disjunctive", "conjunctive", "disjunctive_pruned"):
            assert e_inc.search(q["query"], mode, q["k"]) == e_full.search(
                q["query"], mode, q["k"]
            ), (q["query"], mode)


def test_compact_after_consolidation(ray_session, tmp_path_factory):
    """compact_index reads the runs checkpoint, which consolidation never
    touches — compacting a consolidated+tombstoned index must equal a
    fresh build over the surviving corpus."""
    from wse_ray.index.extend import (
        consolidate_generations,
        delete_docs,
        load_tombstones,
    )
    from wse_ray.index.extend import compact_index

    d = str(tmp_path_factory.mktemp("cac_corpus"))
    paths = write_corpus_parquet(d, 300, n_files=6)
    inc = str(tmp_path_factory.mktemp("cac_inc"))
    cfg = BuildConfig(num_partitions=3)
    build_index(paths[:3], inc, cfg)
    for i in (3, 4, 5):
        extend_index(inc, [paths[i]])
    consolidate_generations(inc)
    deleted = list(range(1, 300, 9))
    delete_docs(inc, deleted)

    cidx = str(tmp_path_factory.mktemp("cac_out"))
    compact_index(inc, cidx)
    assert len(load_tombstones(cidx)) == 0

    # fresh build over the corpus with the deleted docs removed
    import pyarrow.parquet as pq

    keep_dir = str(tmp_path_factory.mktemp("cac_keep"))
    dropped = 0
    kept_paths = []
    for i, p in enumerate(sorted(paths)):
        t = pq.read_table(p)
        n = t.num_rows
        mask = [
            (dropped + j) not in set(deleted) for j in range(n)
        ]
        dropped += n
        import pyarrow as _pa

        kp = os.path.join(keep_dir, os.path.basename(p))
        pq.write_table(t.filter(_pa.array(mask)), kp)
        kept_paths.append(kp)
    fresh = str(tmp_path_factory.mktemp("cac_fresh"))
    build_index(kept_paths, fresh, cfg)

    e_c, e_f = SearchEngine(cidx), SearchEngine(fresh)
    assert e_c.stats == e_f.stats
    assert _search_all(e_c) == _search_all(e_f)
