#!/usr/bin/env python3
"""Summarize one or more bench_*.json runs: total, top-N, anomalies.
Usage: python3 tools/summ_bench.py target/r20/bench_tag_*.json [-n 12]"""
import json, sys
args = sys.argv[1:]
if '-n' in args:
    i = args.index('-n'); args = args[:i] + args[i+2:]
files = args
n = 12
if '-n' in sys.argv: n = int(sys.argv[sys.argv.index('-n')+1])
runs = []
for f in files:
    d = json.load(open(f))
    runs.append((f, d))
    q = d['queries']
    print(f"{f}: total={d['value']:.1f} s/q={d['value']/max(1,len(q)):.3f} "
          f"anom={d.get('anomalous_passes','-')} first_s={d.get('first_s',{})} "
          f"jit={d.get('jit_s_total',0):.0f} sched={d.get('sched_wait_total',0):.1f} "
          f"gc={d.get('gc_total',0):.2f} reads={d.get('index_store_reads')} "
          f"bw={d.get('build_warm_s_total',0):.1f} probes={list(d.get('probes',{}).values())}")
    top = sorted(q.items(), key=lambda kv: -kv[1])[:n]
    for k, v in top:
        tmin = d.get('t_min',{}).get(k,-1); tmax = d.get('t_max',{}).get(k,-1)
        print(f"   {k:28s} {v:7.3f} min={tmin:6.3f} max={tmax:7.3f} jobs={d.get('jobs',{}).get(k)}")
if len(runs) > 1:
    import statistics
    keys = set()
    for _, d in runs: keys |= set(d['queries'])
    med = {k: statistics.median([d['queries'][k] for _, d in runs if k in d['queries']]) for k in keys}
    print(f"\nsum of per-query medians over {len(runs)} runs: {sum(med.values()):.1f} "
          f"s/q={sum(med.values())/len(med):.3f}")
    for k, v in sorted(med.items(), key=lambda kv: -kv[1])[:n]: print(f"   {k:28s} {v:7.3f}")

# tail-mass metric: sum over queries of (max - median) — the storm tail a
# config leaves in a run; plus count of passes > 2x median
def tailmass(d):
    q, tmax = d['queries'], d.get('t_max', {})
    tm = sum(max(0.0, tmax.get(k, -1) - v) for k, v in q.items() if tmax.get(k, -1) >= 0)
    n2 = sum(1 for k, v in q.items() if tmax.get(k, -1) > 2 * max(v, 0.3))
    return tm, n2
for f, d in runs:
    tm, n2 = tailmass(d)
    print(f"tail: {f} tailmass={tm:.1f}s passes>2xmed={n2}")
