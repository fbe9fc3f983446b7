"""Benchmark harness — encode/decode throughput on the transcript table.

Default: run headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line::

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "turns_per_sec": ..., "compression_ratio": ..., ...}

``--scaling``: run the same encode job at two parallelism levels (default
local[1] vs local[4] — N vs 4N executors stand-in per BASELINE.json; the
pair the sandbox VM can physically scale, see BENCH/BASELINE.md's
hardware-ceiling section; override with SPARK_GRAFT_SCALE_PAIR=4,16) in
subprocesses; writes BENCH/scaling_run.md + appends BENCH/runs.log.
``--substrate-pair``: measured kernel/substrate decomposition at both
legs (identical plan with and without codec work).
``--ceiling``: engine-free pure-numpy process-scaling ceiling of this VM.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _sf_from_dir(d: str) -> float:
    try:
        return float(Path(d).name.replace("sf", ""))
    except ValueError:
        return -1.0


def _transcript_conversations(sf: float) -> int:
    # mean ~21 turns/conversation → sf0.1 ≈ 600k turns (matches lineitem rows)
    return max(200, int(280_000 * sf))


def run_bench(encode_only: bool = False) -> dict:
    """Best-of-N over the full query suite (N = SPARK_GRAFT_BENCH_REPEAT,
    default 3; 2 for --encode-only scaling legs).  This VM carries ~7 cores
    of phantom host load (CLAUDE.md) — a single pass is a coin flip, so the
    artifact of record reports per-query best across N passes plus the
    per-pass totals and the load average, letting a reader judge the noise."""
    from pyspark.sql import functions as F

    from varint_spark import transcripts
    from varint_spark.engine import EncodeOptions, decode_blocks, encode_transcripts, roundtrip
    from varint_spark.session import get_spark

    sf = _sf_from_dir(SF_DIR)
    # SPARK_GRAFT_BUCKETS pins the job shape (same logical job at every
    # parallelism level — required for an honest scaling comparison)
    buckets = int(os.environ.get("SPARK_GRAFT_BUCKETS", 0)) or int(CPUS) * 4
    spark = get_spark("varint_spark_bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(buckets // 2, int(CPUS) * 2))
    opts = EncodeOptions(num_buckets=buckets, chunk_rows=65_536, salt_span=262_144)

    n_conv = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", 0)) or _transcript_conversations(sf)
    tdf = transcripts.generate_distributed(spark, n_conversations=n_conv, n_hot=3,
                                           hot_turns=30_000)
    tdf = tdf.repartition(int(CPUS) * 2).cache()
    n_turns = tdf.count()

    extras: dict = {}
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", 0)) or (2 if encode_only else 3)
    try:
        extras["loadavg_start"] = round(os.getloadavg()[0], 1)
    except OSError:
        pass

    # Warm the Python workers (imports of numpy/pandas/varint_spark happen
    # once per worker): a tiny encode+decode before the timed runs. At real
    # scale this cost amortizes to zero; locally it would otherwise dominate.
    warm = transcripts.generate_spark(spark, n_conversations=50, n_hot=0)
    decode_blocks(encode_transcripts(warm.repartition(int(CPUS)), opts),
                  transcripts.TRANSCRIPT_DDL).count()

    best: dict[str, float] = {}
    run_totals: list[float] = [0.0] * repeat

    # encode passes FIRST, before any cache of the blocks plan exists:
    # Spark's CacheManager matches identical logical plans, so caching the
    # blocks DataFrame up front would silently turn every timed encode
    # into a cache read (this bug made one smoke run report 3.6M turns/s)
    for rep in range(repeat):
        t0 = time.time()
        agg = encode_transcripts(tdf, opts).agg(
            F.sum("raw_bytes").alias("raw"), F.sum("encoded_bytes").alias("enc"),
            F.sum("varint_bytes").alias("var")).collect()[0]
        dt = time.time() - t0
        run_totals[rep] += dt
        best["encode_transcripts"] = min(best.get("encode_transcripts", 1e9), dt)

    shared = None
    if not encode_only:
        from varint_spark.shared import build_shared_tables

        t0 = time.time()
        shared = spark.sparkContext.broadcast(build_shared_tables(tdf))
        extras["shared_build_sec"] = round(time.time() - t0, 3)
        # cached blocks so decode passes measure decode, not a re-encode
        blocks = encode_transcripts(tdf, opts).cache()
        blocks.count()

    for rep in range(repeat):
        cur: dict[str, float] = {}

        if not encode_only:
            t0 = time.time()
            sagg = encode_transcripts(tdf, opts, shared=shared).agg(
                F.sum("encoded_bytes").alias("enc"),
                F.sum("raw_bytes").alias("raw")).collect()[0]
            cur["encode_shared_tables"] = time.time() - t0
            extras["compression_ratio_shared"] = round(sagg["raw"] / sagg["enc"], 3)

            t0 = time.time()
            decode_blocks(blocks, transcripts.TRANSCRIPT_DDL).count()
            cur["decode_transcripts"] = time.time() - t0

            t0 = time.time()
            ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
            roundtrip(ev, "user_id", "event_id", opts).count()
            cur["roundtrip_events"] = time.time() - t0

            t0 = time.time()
            li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            roundtrip(li, "l_orderkey", "l_linenumber", opts).count()
            cur["roundtrip_lineitem"] = time.time() - t0

            t0 = time.time()
            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            roundtrip(docs, "lang", "doc_id", opts).count()
            cur["roundtrip_documents"] = time.time() - t0

        run_totals[rep] = round(run_totals[rep] + sum(cur.values()), 3)
        for k, v in cur.items():
            best[k] = min(best.get(k, float("inf")), v)

    queries = {k: round(v, 3) for k, v in best.items()}
    extras["turns_per_sec"] = round(n_turns / best["encode_transcripts"], 1)
    extras["n_turns"] = n_turns
    extras["compression_ratio"] = round(agg["raw"] / agg["enc"], 3)
    extras["vs_varint_floor"] = round(agg["var"] / agg["enc"], 3)
    extras["bench_repeat"] = repeat
    extras["run_totals_sec"] = run_totals

    result = {
        "metric": "transcript encode+decode wall seconds (headline: turns_per_sec)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        **extras,
    }
    spark.stop()
    return result


def run_substrate() -> dict:
    """MEASURED kernel/substrate decomposition at one parallelism level.

    Runs the identical job plan twice: (a) the real encode, (b) an
    identity pass — same repartition(bucket, salt) shuffle, same grouped
    applyInArrow, same stable sort and chunk slicing, but NO codec work.
    (b) is the single-box substrate (shuffle I/O, JVM→Arrow→Python
    transfer, sort, scheduling); (a)−(b) is the measured kernel time K.
    On a real N→4N cluster the substrate scales with NODES (each executor
    brings its own memory channels and disks); on one box it is the shared
    memory bus — this mode turns that argument from a fitted model into a
    per-leg measurement (VERDICT r2 requirement)."""
    from pyspark.sql import functions as F

    from varint_spark import transcripts
    from varint_spark.engine import (EncodeOptions, decode_blocks, encode_transcripts,
                                     with_partition_keys)
    from varint_spark.session import get_spark

    import pyarrow as pa

    sf = _sf_from_dir(SF_DIR)
    buckets = int(os.environ.get("SPARK_GRAFT_BUCKETS", 0)) or int(CPUS) * 4
    spark = get_spark("varint_spark_substrate", master=f"local[{CPUS}]",
                      shuffle_partitions=max(buckets // 2, int(CPUS) * 2))
    opts = EncodeOptions(num_buckets=buckets, chunk_rows=65_536, salt_span=262_144)
    n_conv = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", 0)) or _transcript_conversations(sf)
    tdf = transcripts.generate_distributed(spark, n_conversations=n_conv, n_hot=3,
                                           hot_turns=30_000)
    tdf = tdf.repartition(int(CPUS) * 2).cache()
    n_turns = tdf.count()

    warm = transcripts.generate_spark(spark, n_conversations=50, n_hot=0)
    decode_blocks(encode_transcripts(warm.repartition(int(CPUS)), opts),
                  transcripts.TRANSCRIPT_DDL).count()

    from varint_spark.engine import TRANSCRIPT_KINDS
    kinds = list(TRANSCRIPT_KINDS)

    def substrate_udf(key, table):
        # identical group-side work minus the codecs: stable sort, column
        # materialization, chunk slicing; emits one tiny row per chunk
        table = table.sort_by([(opts.group_col, "ascending"),
                               (opts.order_col, "ascending")])
        cols = {c: table.column(c).combine_chunks() for c in kinds}
        n = table.num_rows
        rows = []
        for chunk_id, start in enumerate(range(0, n, opts.chunk_rows)):
            m = min(opts.chunk_rows, n - start)
            nbytes = sum(a.slice(start, m).nbytes for a in cols.values())
            rows.append({"chunk_id": chunk_id, "n": m, "nbytes": nbytes})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("chunk_id", pa.int32()), ("n", pa.int64()), ("nbytes", pa.int64())]))

    keyed = with_partition_keys(tdf, opts)
    t_sub = float("inf")
    for _ in range(2):
        t0 = time.time()
        keyed.groupBy("_bucket", "_salt").applyInArrow(
            substrate_udf, "chunk_id int, n long, nbytes long"
        ).agg(F.sum("n")).collect()
        t_sub = min(t_sub, time.time() - t0)

    t_total = float("inf")
    for _ in range(2):
        t0 = time.time()
        encode_transcripts(tdf, opts).agg(F.sum("encoded_bytes")).collect()
        t_total = min(t_total, time.time() - t0)

    spark.stop()
    return {"cpus": int(CPUS), "n_turns": n_turns, "sf": sf,
            "t_total": round(t_total, 3), "t_substrate": round(t_sub, 3),
            "t_kernel": round(t_total - t_sub, 3)}


def _ceiling_task(seed: int) -> float:
    """One memory-streaming numpy task shaped like a codec kernel pass
    (stats + shift/mask sweeps over a few-MB int64 array)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    v = rng.integers(0, 1 << 20, 4_000_000).astype(np.int64)
    t0 = time.perf_counter()
    for _ in range(12):
        mn = v.min()
        off = (v - mn).view(np.uint64)
        w = int(v.max() - mn).bit_length() or 1
        acc = (off >> np.uint64(1)) ^ (off << np.uint64(w % 7 + 1))
        int(acc.sum())
    return time.perf_counter() - t0


def run_ceiling() -> None:
    """HARDWARE CEILING: how well does pure numpy — no Spark, no shuffle,
    no engine — scale across processes on THIS VM? Mean per-task time at
    n processes vs at 1 process bounds ANY engine's achievable scaling
    efficiency (memory bandwidth + the sandbox's ~7-core phantom host
    load are shared; see CLAUDE.md). Reported so the engine's measured
    pairs can be judged against what the box physically allows."""
    import multiprocessing as mp

    means = {}
    for n in (1, 2, 4, 8, 16):
        with mp.Pool(n) as p:
            times = p.map(_ceiling_task, range(n))
        means[n] = sum(times) / n
    out = {"mode": "ceiling", "mean_task_sec": {str(n): round(t, 3) for n, t in means.items()},
           "efficiency_vs_1proc": {str(n): round(means[1] / means[n], 3) for n in means},
           "pair_ceilings": {f"{a}->{b}": round(means[a] / means[b], 3)
                             for a, b in [(1, 4), (2, 8), (4, 16)]}}
    with open(REPO / "BENCH" / "runs.log", "a") as fh:
        fh.write(json.dumps(out) + "\n")
    print(json.dumps(out, indent=2))


def run_substrate_pair() -> None:
    """Measured substrate/kernel decomposition at N and 4N (subprocesses)."""
    n_low, n_high = os.environ.get("SPARK_GRAFT_SCALE_PAIR", "1,4").split(",")
    results = {}
    for cpus in (n_low, n_high):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=SF_DIR,
                   SPARK_GRAFT_BUCKETS=os.environ.get("SPARK_GRAFT_BUCKETS")
                   or str(max(int(n_high) * 16, 128)))
        out = subprocess.run([sys.executable, str(REPO / "bench.py"), "--substrate"],
                             env=env, capture_output=True, text=True, check=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    lo, hi = results[n_low], results[n_high]
    ratio = int(n_high) / int(n_low)
    entry = {
        "mode": "substrate",
        "pair": [n_low, n_high],
        "n_turns": hi["n_turns"],
        "t_total": {n_low: lo["t_total"], n_high: hi["t_total"]},
        "t_substrate": {n_low: lo["t_substrate"], n_high: hi["t_substrate"]},
        "t_kernel": {n_low: lo["t_kernel"], n_high: hi["t_kernel"]},
        "eff_total": round(lo["t_total"] / (ratio * hi["t_total"]), 3),
        "eff_kernel": round(lo["t_kernel"] / (ratio * hi["t_kernel"]), 3),
        "eff_substrate": round(lo["t_substrate"] / (ratio * hi["t_substrate"]), 3),
    }
    with open(REPO / "BENCH" / "runs.log", "a") as fh:
        fh.write(json.dumps(entry) + "\n")
    print(json.dumps(entry, indent=2))


def run_scaling() -> None:
    """Same encode job at local[8] vs local[32]; efficiency = T8_rate×? —
    per BASELINE.json: throughput scaling efficiency ≥ 0.8 from N to 4N."""
    results = {}
    n_low, n_high = os.environ.get("SPARK_GRAFT_SCALE_PAIR", "1,4").split(",")
    for cpus in (n_low, n_high):
        # big enough that codec compute dominates scheduler/serde overhead
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus, SPARK_GRAFT_SF_DIR=SF_DIR,
                   SPARK_GRAFT_BENCH_CONVS=os.environ.get("SPARK_GRAFT_BENCH_CONVS", "1600000"),
                   # identical job shape on both legs; enough buckets that
                   # the 4N leg still gets several balanced waves (stragglers
                   # in a handful of big groups read as false inefficiency)
                   SPARK_GRAFT_BUCKETS=os.environ.get("SPARK_GRAFT_BUCKETS")
                   or str(max(int(n_high) * 16, 128)))
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py"), "--encode-only"],
            env=env, capture_output=True, text=True, check=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8, r32 = results[n_low]["turns_per_sec"], results[n_high]["turns_per_sec"]
    eff = (r32 / r8) / (int(n_high) / int(n_low))
    md = f"""# BENCH — two-parallelism scaling evidence

Same encode job (synthetic transcript table, {results[n_high]['n_turns']:,} turns,
sf={results[n_high]['sf']}) at two parallelism levels on one host —
`local[{n_low}]` vs `local[{n_high}]` standing in for N vs 4N executors
(BASELINE.json north rule; no real cluster in this sandbox — the pair is
sized to the machine's *available* cores, since the sandbox VM carries
~7 cores of permanent host-side load that would starve a local[32] run).

| parallelism | encode wall (s) | turns/sec | compression ratio |
|---|---|---|---|
| local[{n_low}]  (N)  | {results[n_low]['queries']['encode_transcripts']} | {r8:,.0f} | {results[n_low]['compression_ratio']} |
| local[{n_high}] (4N) | {results[n_high]['queries']['encode_transcripts']} | {r32:,.0f} | {results[n_high]['compression_ratio']} |

**Scaling efficiency (N→4N): {eff:.3f}** (target ≥ 0.8 — note single-host
stand-in shares memory bandwidth; on a real 4N-executor cluster the encode
stage is embarrassingly parallel after its single shuffle).

Compressed size vs reference-faithful varint stream (int columns):
encoded/varint = {1/results[n_high]['vs_varint_floor']:.3f} (≤ 1.0 means we
beat the reference floor; string columns have no reference codec).
"""
    kb = subprocess.run([sys.executable, str(REPO / "scripts" / "kernel_bench.py")],
                        capture_output=True, text=True)
    if kb.returncode == 0:
        kern = json.loads(kb.stdout)
        md += """
## Single-core kernel throughput vs reference claims

Reference (BASELINE.md): BP128 200 MB/s scalar / 800 MB/s SIMD encode,
300 MB/s / 1.2 GB/s decode; these numpy kernels run one per executor
thread, so single-node aggregate = per-core x cores.

| kernel (data shape) | encode MB/s | decode MB/s | ratio |
|---|---|---|---|
"""
        for name, r in kern.items():
            if "encode_MBps" not in r:
                continue  # non-codec entries (e.g. shingle-hash kernels)
            md += f"| {name} | {r['encode_MBps']} | {r['decode_MBps']} | {r['ratio']} |\n"
        shingle = {k: v for k, v in kern.items() if "plane_kernel_MBps" in v}
        if shingle:
            md += ("\nText-pipeline plane kernels (corpus-plane rolling hash"
                   " vs the per-document loop it replaced):\n\n"
                   "| corpus shape | legacy loop MB/s | plane kernel MB/s | speedup |\n"
                   "|---|---|---|---|\n")
            for name, r in shingle.items():
                md += (f"| {name} | {r['legacy_loop_MBps']} |"
                       f" {r['plane_kernel_MBps']} | {r['speedup']}x |\n")
    (REPO / "BENCH").mkdir(exist_ok=True)
    # mechanical output goes to scaling_run.md + an append-only run log;
    # BENCH/BASELINE.md is the hand-curated summary (best-of-N with full
    # variance disclosure — see CLAUDE.md on this VM's noise)
    (REPO / "BENCH" / "scaling_run.md").write_text(md)
    with open(REPO / "BENCH" / "runs.log", "a") as fh:
        fh.write(json.dumps({
            "pair": [n_low, n_high],
            "n_turns": results[n_high]["n_turns"],
            "turns_per_sec": {n_low: r8, n_high: r32},
            "encode_wall": {n_low: results[n_low]["queries"]["encode_transcripts"],
                            n_high: results[n_high]["queries"]["encode_transcripts"]},
            "efficiency": round(eff, 3),
        }) + "\n")
    print(md)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--substrate-pair" in sys.argv:
        run_substrate_pair()
    elif "--ceiling" in sys.argv:
        run_ceiling()
    elif "--substrate" in sys.argv:
        print(json.dumps(run_substrate()))
    else:
        print(json.dumps(run_bench(encode_only="--encode-only" in sys.argv)))
