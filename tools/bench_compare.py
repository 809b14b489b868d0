#!/usr/bin/env python3
"""Compare two bench artifacts query-by-query, with canary context.

Usage: bench_compare.py <benchA.json> <benchB.json>

Accepts either the raw one-line JSON that graft.Bench writes (keys
"value"/"queries"/"canary"/...) or the driver's BENCH_r{N}.json wrapper,
whose "tail" field holds only the LAST bytes of stdout — i.e. a
TRUNCATED bench line that starts mid-queries-map. Everything is
therefore extracted by regex rather than a JSON parse: the per-query
times visible in the artifact, the canary objects, the context verdict,
and the families map. Prints what round-11's verdict had to
reconstruct by hand when adjudicating a headline delta: total ratio,
each run's own context verdict and canary ratios (attribute a mover to
the measuring window before attributing it to code), per-family
ratios, the median/mean per-query ratio over the shared visible
surface (a uniform median shift with a flat total is the documented
external-contention signature, SCALE.md 3), and the top absolute
movers. Driver-side analysis helper only.
"""
import json
import re
import statistics
import sys

QUERY_RE = re.compile(r'"(q\d+_[A-Za-z0-9_]+)":([0-9]+\.[0-9]+)')
# per-query attribution (r12): "name":[cpuPerWall,gcSec,loadAvg]
QATTR_RE = re.compile(
    r'"(q\d+_[A-Za-z0-9_]+)":\[([0-9.]+),([0-9.]+),(-?[0-9.]+)\]')
CANARY_RE = re.compile(r'"(canary(?:Batch)?)":\{"query":"([^"]+)"'
                       r'[^}]*?"ratio":([0-9.]+)')
VERDICT_RE = re.compile(r'"contextVerdict":"([^"]*)"')
TOTAL_RE = re.compile(r'"metric":"total","value":([0-9.]+)')
# Cluster-probe artifacts (r12_cluster_sf1_*.json) carry their sum under
# a bare "total" key instead of the Bench metric/value shape — without
# this fallback they were mislabeled "TRUNCATED artifact" with no
# total-ratio line (ADVICE r12). Scale `time` A/B artifacts (totalA/
# totalB in ONE file) stay out of scope: they are already a comparison,
# not one leg of one.
SCALE_TOTAL_RE = re.compile(r'"total":([0-9.]+)')
FAMILIES_RE = re.compile(r'"families":\{([^}]*)\}')
FAMILY_PAIR_RE = re.compile(r'"([A-Za-z_]+)":([0-9.]+)')


def load(path):
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict) and "tail" in doc:
            text = doc["tail"] or ""
    except ValueError:
        pass  # not a JSON wrapper; treat as raw text
    queries = {m.group(1): float(m.group(2)) for m in QUERY_RE.finditer(text)}
    total = TOTAL_RE.search(text) or SCALE_TOTAL_RE.search(text)
    fam = {}
    fm = FAMILIES_RE.search(text)
    if fm:
        fam = {m.group(1): float(m.group(2))
               for m in FAMILY_PAIR_RE.finditer(fm.group(1))}
    canaries = {m.group(1): (m.group(2), float(m.group(3)))
                for m in CANARY_RE.finditer(text)}
    verdict = VERDICT_RE.search(text)
    qattr = {m.group(1): (float(m.group(2)), float(m.group(3)),
                          float(m.group(4)))
             for m in QATTR_RE.finditer(text)}
    return {
        "queries": queries,
        "qattr": qattr,
        "total": float(total.group(1)) if total else None,
        "families": fam,
        "canaries": canaries,
        "verdict": verdict.group(1) if verdict else None,
    }


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    for name, doc, path in (("A", a, sys.argv[1]), ("B", b, sys.argv[2])):
        kind = ("full artifact" if doc["total"] is not None
                else f"TRUNCATED artifact: only {len(doc['queries'])} queries visible")
        print(f"[{name}] {path} ({kind})")
        print(f"[{name}] contextVerdict: {doc['verdict'] or 'n/a (pre-r12 artifact)'}")
        for key in ("canary", "canaryBatch"):
            if key in doc["canaries"]:
                q, r = doc["canaries"][key]
                print(f"[{name}] {key} {q}: last/mid {r:.2f}")
    if a["total"] is not None and b["total"] is not None:
        print(f"total: {a['total']:.1f} s -> {b['total']:.1f} s  "
              f"ratio {b['total'] / a['total']:.3f}")
    fa, fb = a["families"], b["families"]
    if fa and fb:
        print("families (A -> B, ratio):")
        for k in sorted(set(fa) & set(fb)):
            print(f"  {k:12s} {fa[k]:7.2f} -> {fb[k]:7.2f}  {fb[k] / fa[k]:.2f}")
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    print(f"shared visible queries: {len(shared)} "
          f"(only in A: {len(set(qa) - set(qb))}, only in B: {len(set(qb) - set(qa))})")
    ratios = [qb[q] / qa[q] for q in shared if qa[q] > 0]
    if ratios:
        print(f"per-query ratio: median {statistics.median(ratios):.3f}, "
              f"mean {statistics.mean(ratios):.3f} "
              "(uniform median shift + flat total = contention signature)")
        suma = sum(qa[q] for q in shared)
        sumb = sum(qb[q] for q in shared)
        print(f"shared-surface time: {suma:.1f} s -> {sumb:.1f} s  "
              f"ratio {sumb / suma:.3f}")
    movers = sorted(shared, key=lambda q: abs(qb[q] - qa[q]), reverse=True)[:10]
    print("top movers by |delta seconds|:")
    for q in movers:
        print(f"  {q:28s} {qa[q]:7.3f} -> {qb[q]:7.3f}  "
              f"delta {qb[q] - qa[q]:+7.3f}  ratio {qb[q] / qa[q]:.2f}")
    # starvation screen (r12 queryAttr): a query whose wall grew while its
    # cpu/wall RATIO fell is starved by the measuring context, not slowed
    # by code — no code regression lowers a fixed plan's cpu/wall. Only
    # meaningful when both artifacts carry queryAttr.
    aa, ab = a["qattr"], b["qattr"]
    both = [q for q in shared if q in aa and q in ab and qa[q] > 0]
    starved = [q for q in both
               if qb[q] / qa[q] > 1.5 and aa[q][0] > 0
               and ab[q][0] / aa[q][0] < 0.67]
    if both:
        print(f"queryAttr present in both for {len(both)} queries; "
              f"starved (wall >1.5x while cpuPerWall <0.67x): {len(starved)}")
        for q in starved[:10]:
            print(f"  {q:28s} wall {qa[q]:.2f}->{qb[q]:.2f}  "
                  f"cpuPerWall {aa[q][0]:.2f}->{ab[q][0]:.2f}  "
                  f"loadAvg {aa[q][2]:.1f}->{ab[q][2]:.1f}  -> context, not code")


if __name__ == "__main__":
    main()
