"""Benchmark harness (driver contract): run every declared query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Stdout is ONE compact JSON headline line —
{"metric", "value", "unit", "queries": steady per-query seconds, "sf",
totals, steady_ratio} — sized so a tail-capture window always keeps it
whole (r9's single 5.5 KB line was clipped mid-object; r10's separate
stdout detail line was clipped again). The COMPLETE record — cold +
steady + the full DuckDB per-query map + errors — is written to
$SPARK_GRAFT_BENCH_OUT (default BENCH_local_latest.json next to this
file), where no capture window can truncate it. The DuckDB baseline
ALWAYS runs side-by-side so the artifact carries a same-machine
same-contention ratio (steady_ratio); pass --no-duckdb to skip it for
a faster Spark-only iteration loop (--duckdb is accepted for
back-compat and is the default behavior).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataworks_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402
from dataworks_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: queries that must be REBUILT every pass: their builder either runs
#: Spark jobs while constructing the result (driver-side fixpoint
#: rounds) or embeds a one-shot localCheckpoint that the first action
#: materializes (the MinHash/SimHash banded signature relations) —
#: re-counting the same returned frame would skip that work, i.e.
#: measure cached results instead of a prepared plan.
_REBUILD_EACH_PASS = {
    "q_datalog_rule",
    # q_dedup_sketch LEFT the set in r15 session 2: its last one-shot
    # state moved into the fingerprint-keyed memo (the capped branch
    # semi-joins a prebuilt minhash_band_survivors asset; the SimHash
    # branch reads its persisted fingerprint memo checkpoint-free) —
    # steady now measures banding + bucket joins + verify re-executed
    # in full per pass off the deliberately-cached sketch assets.
    "q_dedup_clusters",  # localCheckpoint-holding fixpoint loop
    "q_dedup_ngram",  # the pigeonhole candidate relation is a one-shot
    # localCheckpoint (it feeds both the touched-id broadcast and the
    # verify stream; checkpointing stops the kernel re-executing per
    # side) — per-run state, so steady must rebuild the plan each pass.
    "q_quality_buckets",  # percentile-boundary job runs at plan build
    # q_contamination_report LEFT the set in r15: its shared (doc, fp)
    # winnow relation moved from a per-frame localCheckpoint into the
    # fingerprint-keyed train-once memo (queries._ann_cached,
    # table="documents") — like q_embed_ann's indexes, the asset is
    # deliberately cached across passes and steady measures banding +
    # pairing, the re-runnable stages of a deployment that stores its
    # fingerprint relation at ingest.
    "q_semantic_dedup",  # the capped branch computes its own
    # assignment (poisoned union) and its sub-shard fold holds a
    # one-shot localCheckpoint — per-run state, so steady must
    # rebuild. NOTE: the QUANTIZER (r13) and the main branch's
    # ASSIGNED relation (r15) are intentionally memo-cached per
    # (app, sf_dir, corpus fingerprint) — ingest-time artifacts, like
    # q_embed_ann's indexes — so steady measures the pair stage plus
    # the capped branch, not re-training or re-assignment.
}


def _sf(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _floor_probe_ms(spark, n: int = 7) -> float:
    """Median wall-clock of ONE trivial cached-count action — the
    per-action floor BASELINE §5b pins (tools/floor_probe.py), read
    inside the bench session so it shares the run's host state. At
    sf0.1 the floor is most of every query's cost, so this single
    number classifies a drifted run: floor up ⇒ host throttling /
    scheduler contention, floor flat but queries up ⇒ look at the
    code (r13's close-out burned seven re-runs making that call
    without it — r13 VERDICT #5)."""
    one = spark.range(1).cache()
    one.count()  # materialize + JIT, off the probe
    ts = []
    for _ in range(max(n, 1)):
        t0 = time.perf_counter()
        one.count()
        ts.append(time.perf_counter() - t0)
    one.unpersist()
    return round(sorted(ts)[len(ts) // 2] * 1000, 2)


def run_spark(
    warm: bool = True, passes: int = 4, duck_con=None
) -> tuple[dict[str, float], dict[str, float], dict[str, str], dict[str, float], dict]:
    """Run every query ``passes`` times; return (cold, steady, errors,
    duckdb) per-query seconds. Cold = first execution (includes Catalyst
    analysis + Java codegen compilation, the ~0.2-0.5 s/query floor an
    embedded engine doesn't pay); steady = MIN over the post-warm
    executions (what a resident engine serves once code is JIT-cached).
    Min-of-N, not last: this VM shows ±3-4× hypervisor contention
    spikes, and the minimum is the standard spike-stripping estimator
    of an engine's actual cost — applied IDENTICALLY to both engines
    (DuckDB's steady is also min over its post-warm passes), so it
    cannot flatter either side. Both cold and steady are reported —
    neither is hidden. Default is 4 passes (3 steady candidates):
    with only 2, a single contention spike landing on each of two
    passes of one query still poisons its min — measured ratio swing
    across identical-code runs was 1.5-2.5 at passes=3.

    When ``duck_con`` is provided, the DuckDB oracle runs INTERLEAVED —
    immediately after each query's Spark execution, in the same
    per-query time window — so machine contention (this VM shows ±3×
    hypervisor-level swings) hits both engines together instead of
    landing entirely on whichever engine's phase it overlapped; the
    same-run per-query ratio is then controlled for noise, not just
    the same-run total.

    Passes are organized as ROUND-ROBIN ROUNDS over all queries (round
    0 = cold, rounds 1.. = steady candidates), not consecutive passes
    per query: the VM's contention arrives in sustained multi-second
    windows, and consecutive passes all land inside one window — the
    min can't strip what it never escapes (measured: identical code
    swung 0.11 s ↔ 0.49 s on a set-op query between same-day runs).
    With rounds, one query's passes are separated by a full sweep
    (~minutes), so a window clips one round of many queries and the
    per-query min recovers each query's uncontended cost."""
    # AQE stays ON even at this sub-second scale: its re-planning costs
    # ~25% on the short scan/agg queries (measured, BASELINE.md §5) but
    # its post-shuffle coalescing is what keeps the iterative fixpoint
    # queries cheap (measured r5 on the since-retired q_recursive_closure:
    # 2 s → 33 s without it; q_datalog_rule exercises the same doubling
    # loop today). One engine config, no per-query special cases.
    spark = get_spark("dataworks_spark_bench")
    passes = max(passes, 2)  # steady needs ≥1 post-warm pass
    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    if warm:  # materialize the shared fixture-table caches once, off the clock
        from dataworks_spark.queries import _t
        from dataworks_spark.session import TABLES

        for t in TABLES:
            try:
                _t(spark, SF_DIR, t).count()
            except Exception:  # noqa: BLE001 — a broken fixture surfaces
                pass  # as per-query error rows below, not a dead bench

        # spin up the Arrow Python-UDF worker pool (session-level process
        # state, like the JVM itself) so the one mapInPandas query isn't
        # charged ~2 s of interpreter fork cost; guarded like the table
        # preload — a broken Arrow/pandas stack surfaces as that one
        # query's error row, not a dead bench
        try:
            spark.range(1).mapInPandas(lambda it: it, "id long").count()
        except Exception:  # noqa: BLE001
            pass
    errors: dict[str, str] = {}
    duck_times: dict[str, float] = {}
    steady_all: dict[str, list[float]] = {}
    prepared: dict[str, object] = {}
    host: dict = {
        "cpus": os.cpu_count(),
        "loadavg_start": [round(x, 2) for x in os.getloadavg()],
        "floor_ms_start": _floor_probe_ms(spark),
    }
    for rnd in range(max(passes, 1)):
        for name, fn in sorted(QUERIES.items()):
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                # Steady rounds re-execute the PREPARED DataFrame: plan
                # construction (hundreds of py4j expression calls for
                # the 64-hash dedup kernels — measured 0.6-1.8 s/query)
                # is paid once in the cold round, exactly as a resident
                # engine serves a prepared statement; every count() is
                # still a full job over the source data. DuckDB's
                # steady is symmetric (warm catalog, re-executed SQL).
                # EXCEPTION: _REBUILD_EACH_PASS queries rebuild in
                # full — reusing their returned frame would re-read
                # checkpointed loop/signature state, i.e. cached
                # results, not a prepared plan.
                df = prepared.get(name)
                if df is None or name in _REBUILD_EACH_PASS:
                    df = fn(spark, SF_DIR)
                    prepared[name] = df
                df.count()  # materialize the full result
            except Exception as exc:  # noqa: BLE001 — one broken query must
                # never destroy the round's entire perf record (BENCH_r03
                # was a stack trace); record the error row and keep going.
                # An error on a LATER round also invalidates the steady
                # number (it would silently be the cold time), so the
                # query is dropped from steady — _ratio then excludes it
                # from both sides and names it in ratio_excluded. The
                # cold entry, if round 0 succeeded, stays: it is a real
                # measurement.
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                steady.pop(name, None)
                continue
            dt = round(time.perf_counter() - t0, 4)
            if rnd == 0:
                cold[name] = dt
            else:
                steady[name] = min(steady.get(name, dt), dt)
                steady_all.setdefault(name, []).append(dt)
            if duck_con is not None and name in ORACLE_SQL:
                # DuckDB immediately after this query's Spark pass:
                # same round, same per-query contention window
                try:
                    t0 = time.perf_counter()
                    duck_con.execute(ORACLE_SQL[name]).fetchall()
                    dt = round(time.perf_counter() - t0, 4)
                    if rnd > 0:
                        duck_times[name] = min(duck_times.get(name, dt), dt)
                except Exception as exc:  # noqa: BLE001 — broken oracle row
                    errors[f"duckdb:{name}"] = f"{type(exc).__name__}: {exc}"[:500]
                    duck_times.pop(name, None)
    # host-state marker (r13 VERDICT #5): loadavg + per-action floor
    # bracketing the run, plus the steady-pass spread (per-query
    # max/min over the post-warm passes — a quiet host reads ~1.0-1.5,
    # a contended window shows up as a fat p90 without any code
    # change). Together these let a reader classify a drifted total
    # as host-state vs regression WITHOUT re-running the bench.
    spreads = sorted(
        max(ts) / min(ts) for ts in steady_all.values() if min(ts) > 0 and len(ts) > 1
    )
    if spreads:
        host["steady_spread_median"] = round(spreads[len(spreads) // 2], 3)
        host["steady_spread_p90"] = round(
            spreads[min(len(spreads) - 1, int(len(spreads) * 0.9))], 3
        )
    host["floor_ms_end"] = _floor_probe_ms(spark)
    host["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    return cold, steady, errors, duck_times, host


def run_duckdb(passes: int = 2) -> dict[str, float]:
    """Standalone DuckDB phase (used by --no-interleave): each query
    runs ``passes`` times and the last pass is recorded (OS page cache
    + DuckDB's own warm state), matching how steady_queries is taken
    for Spark. One-pass DuckDB vs second-pass Spark would flatter
    Spark. The default path instead interleaves DuckDB per query inside
    run_spark — see its docstring."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from oracle_harness import duckdb_conn

    con = duckdb_conn(SF_DIR)
    times: dict[str, float] = {}
    for name, sql in sorted(ORACLE_SQL.items()):
        for _ in range(max(passes, 1)):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times[name] = round(time.perf_counter() - t0, 4)
    return times


def _ratio(steady: dict[str, float], duck: dict[str, float]) -> dict:
    """Same-machine same-run ratio over the oracle query set — machine
    contention hits both engines in the same window, so this is the
    fairest single number for 'PySpark vs the DuckDB baseline'.

    A query that errored on the Spark side has no steady entry; it is
    excluded from BOTH sums (and named in ratio_excluded) so a broken
    query can never flatter the ratio by contributing 0 s to Spark
    while DuckDB's time stays in the denominator."""
    common = [q for q in duck if q in steady]
    excluded = sorted(q for q in duck if q not in steady)
    sp = round(sum(steady[q] for q in common), 4)
    du = round(sum(duck[q] for q in common), 4)
    out = {
        "oracle_spark_steady_total": sp,
        "oracle_duckdb_total": du,
        "steady_ratio": round(sp / du, 3) if du else None,
    }
    if excluded:
        out["ratio_excluded"] = excluded
    return out


def main() -> None:
    # DuckDB baseline always rides along, INTERLEAVED per query (same
    # machine, same run, same per-query contention window — the fairest
    # ratio on a VM with hypervisor-level noise); guarded so a baseline
    # failure can never take the Spark numbers down with it.
    # --duckdb is accepted for back-compat and is the default.
    duck_con = None
    if "--no-duckdb" not in sys.argv:
        try:
            sys.path.insert(
                0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests")
            )
            from oracle_harness import duckdb_conn

            duck_con = duckdb_conn(SF_DIR)
        except Exception:  # noqa: BLE001 — fall back to Spark-only
            duck_con = None
    cold, steady, errors, duck, host = run_spark(duck_con=duck_con)
    ratio: dict = _ratio(steady, duck) if duck else {}
    out = {
        "metric": "total_query_wall_clock",
        "value": round(sum(cold.values()), 4),
        "unit": "sec",
        "queries": steady,
        "sf": _sf(SF_DIR),
        "steady_total": round(sum(steady.values()), 4),
        "host": host,
    }
    if errors:
        out["n_errors"] = len(errors)
    out.update(ratio)
    # The COMPLETE record (cold + steady + the full DuckDB per-query
    # map + errors) goes to a FILE — tail-capture windows clipped the
    # stdout detail line two rounds running (r10 VERDICT #2: only 16/46
    # DuckDB entries survived in BENCH_r10.json and the repo-side local
    # file carried no duckdb dict at all; files don't get tail-clipped).
    # Stdout stays minimal: ONE compact headline line (~1.5 KB), the
    # driver contract.
    full = dict(out)
    full["queries_cold"] = cold
    # decompose the cold pass (r15 VERDICT #2): how much of the cold
    # total was fingerprint-keyed ASSET builds (paid once per corpus,
    # inside whichever query's cold pass first needed each asset) vs
    # first-execution cost of the queries themselves. Asset seconds are
    # recorded by queries._ann_cached around each build() call.
    from dataworks_spark.queries import ASSET_BUILD_SECONDS

    if ASSET_BUILD_SECONDS:
        full["cold_decomposition"] = {
            "asset_build_sec": dict(sorted(ASSET_BUILD_SECONDS.items())),
            "asset_build_total": round(sum(ASSET_BUILD_SECONDS.values()), 4),
            "cold_total": round(sum(cold.values()), 4),
        }
    if duck:
        full["duckdb"] = duck
    if errors:
        full["errors"] = errors
    record_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local_latest.json"),
    )
    try:
        with open(record_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    except OSError as exc:  # read-only checkout: keep the stdout record
        print(json.dumps({"detail": f"record write failed: {exc}"}))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
