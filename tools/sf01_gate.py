#!/usr/bin/env python3
"""Standing sf0.1 oracle sub-gate (VERDICT r12 #3).

The one-off sf0.1 sweep in round 12 caught two real cross-engine bug
classes the sf0.01 gate had masked (DECIMAL-literal ULP skew, raw-STDDEV
boundary rounding) — so the cheap ~95% of the suite is now gated at
sf0.1 EVERY round, with the DuckDB-hour tail excluded EXPLICITLY and
recorded in the artifact (not prose).

Usage:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.1 <out01Dir>"
  python3 tools/sf01_gate.py /root/testdata/sf0.1 <out01Dir> [artifact.json]

Writes <artifact.json> (default CORRECTNESS_SF01.json at the repo root):
one entry per SparkEntry query with its gate SF —
  {"gate_sf": "0.1",  "ok": true/false, "err": ...}          gated here
  {"gate_sf": "0.01", "excluded_reason": "..."}              expensive tail
  {"gate_sf": "0.01", "rows_only": true}                     no oracle SQL
Exit 1 if any sf0.1-gated entry fails.
"""
import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck  # noqa: E402
import duckdb     # noqa: E402
import pandas as pd  # noqa: E402

# The expensive tail, excluded from the per-round sf0.1 gate and left on
# the one-off cadence (each was green in the round-12 full sweep). These
# are DuckDB-side costs — the engine side runs in seconds; the oracle
# replays (token-set joins / CC label-propagation chains) blow up on
# DuckDB's unindexed self-joins at sf0.1 corpus size.
EXCLUDED = {
    "q_canonicalize": "CC replay: DuckDB label-propagation chain, ~50min at sf0.1 (green in the r12 one-off sweep)",
    "q_canonicalize_best": "CC replay + best-quality election, ~1.5-2.5h at sf0.1 (green in the r12 one-off sweep)",
    "q_neardup_cluster": "CC replay over LSH pairs, ~1.5-2.5h at sf0.1 (green in the r12 one-off sweep)",
    "q_jaccard_neardup": "token-set self-join replay, ~1.5-2.5h at sf0.1 (green in the r12 one-off sweep)",
    "q_pagerank": "power-iteration edge replay, ~1h class at sf0.1 (green in the r12 one-off sweep)",
    "q_leakage_split": "CC-derived split replay, ~1h class at sf0.1 (green in the r12 one-off sweep)",
    "q_semantic_dedup": "rep-dot replay over the embedding corpus, ~1h class at sf0.1 (green in the r12 one-off sweep)",
}


def main(sf_dir, out_dir, artifact="CORRECTNESS_SF01.json"):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = artifact if os.path.isabs(artifact) else os.path.join(repo, artifact)
    con = duckdb.connect()
    for t in selfcheck.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = sorted(d for d in os.listdir(out_dir)
                  if os.path.isdir(os.path.join(out_dir, d)))
    results, nfail = {}, 0
    for name in dirs:
        if name in EXCLUDED:
            results[name] = {"gate_sf": "0.01",
                             "excluded_reason": EXCLUDED[name]}
            print(f"SKIP {name}: {EXCLUDED[name]}")
            continue
        if name not in oracle:
            results[name] = {"gate_sf": "0.01", "rows_only": True}
            print(f"SKIP {name}: rows-only (no oracle SQL)")
            continue
        t0 = time.time()
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.sql(oracle[name]).df()
            problems = selfcheck.compare(name, got, want)
        except Exception as e:
            problems = [f"error: {e}"]
        dt = time.time() - t0
        if problems:
            nfail += 1
            results[name] = {"gate_sf": "0.1", "ok": False,
                             "err": problems[:5], "oracle_sec": round(dt, 1)}
            print(f"FAIL {name}: {problems[0]}")
        else:
            results[name] = {"gate_sf": "0.1", "ok": True,
                             "rows": int(len(got)), "oracle_sec": round(dt, 1)}
            print(f"OK   {name} ({len(got)} rows, {dt:.1f}s)")
    stale = sorted(set(EXCLUDED) - set(dirs))
    if stale:
        print(f"WARNING: excluded entries with no Verify result: {stale}")
    gated = sum(1 for r in results.values() if r.get("gate_sf") == "0.1")
    with open(artifact, "w") as f:
        json.dump({"sf_dir": sf_dir,
                   "gated_at_sf01": gated,
                   "failed": nfail,
                   "excluded": sorted(EXCLUDED),
                   "entries": results}, f, indent=1, sort_keys=True)
    print(f"\n{gated - nfail} ok, {nfail} fail at sf0.1 "
          f"({len(EXCLUDED)} excluded, artifact: {artifact})")
    return 1 if nfail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], *sys.argv[3:]))
