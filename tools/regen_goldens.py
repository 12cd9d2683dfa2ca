"""Regenerate wse_ray/pipelines/goldens.py from the sf0.01 pipelines.

Run ONLY after an intentional behavior change to snippets/simhash/IVF:
    PYTHONPATH=. python tools/regen_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = '''"""Pinned-golden oracles for the non-SQL-expressible gates.

These VALUES literals are the sf0.01 outputs of the corresponding Ray
pipelines, generated once and pinned (testdata is driver-generated
deterministically).  They are DETERMINISM/REGRESSION oracles — weaker than
the independent recomputation oracles in oracles.py: the underlying
algorithm semantics (snippet byte behavior, simhash banding, IVF recall)
are verified separately by pytest goldens and property tests; this pin
makes any drift visible to the driver gate as a hash mismatch.

Regenerate (after an INTENTIONAL behavior change only) with
tools/regen_goldens.py.
"""
'''


def sql_lit(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(round(v, 6))
    return str(int(v))


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from wse_ray.pipelines import engine_queries as eq

    sf = "/root/testdata/sf0.01"
    specs = [
        ("SNIPPETS_GOLDEN_SF001", eq.q_search_snippets),
        ("SIMHASH_GOLDEN_SF001", eq.q_dedup_simhash),
        ("ANN_IVF_GOLDEN_SF001", eq.q_ann_ivf),
        ("ANN_LSH_GOLDEN_SF001", eq.q_ann_lsh),
        ("DECONTAM_BLOOM_GOLDEN_SF001", eq.q_decontam_bloom),
        ("KMEANS_GOLDEN_SF001", eq.q_kmeans_embed),
        ("HLL_GOLDEN_SF001", eq.q_hll_users_daily),
        ("CRAWL_GOLDEN_SF001", eq.q_crawl_frontier),
    ]
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "wse_ray", "pipelines", "goldens.py"
    )
    with open(out_path, "w") as f:
        f.write(HEADER)
        for name, fn in specs:
            df = fn(sf)
            rows = ",\n".join(
                "(" + ", ".join(sql_lit(v) for v in r) + ")"
                for r in df.itertuples(index=False)
            )
            f.write(f"{name}_COLS = {list(df.columns)!r}\n")
            f.write(f'{name} = """\n{rows}"""  # {len(df)} rows\n\n')
    print(f"wrote {out_path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
