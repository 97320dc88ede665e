#!/usr/bin/env python3
"""OOM-safe sf0.1 oracle gate: run check.py in batches (the q_treeemd_topk
N^2 CTE gets a solo pass) and aggregate the FAILED lines."""
import json, os, subprocess, sys

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(oracle.keys())
heavy = [n for n in names if n in ("q_treeemd_topk", "q_treeemd3d_topk",
                                   "q_treeemd_pairs", "q_treeemd3d_pairs",
                                   # the round-15 closed-form LP oracles and
                                   # unrolled-trainer replays: ~20-30s each at
                                   # sf0.1 (N^2 rubner scans / 30-round CTE
                                   # chains) — solo passes keep peak RSS flat
                                   "q_emd3d_pairs", "q_emd3d_topk",
                                   "q_treeexact3d_pairs",
                                   "q_bpe_train", "q_wordpiece_train")]
light = [n for n in names if n not in heavy]
batches = [light[i::3] for i in range(3)] + [[n] for n in heavy]
all_ok = True
for bi, batch in enumerate(batches):
    if not batch:
        continue
    scratch = f"/tmp/ck_{bi}"
    subprocess.run(["rm", "-rf", scratch])
    os.makedirs(scratch)
    json.dump({n: oracle[n] for n in batch}, open(f"{scratch}/oracle_sql.json", "w"))
    for n in batch:
        src = f"{outdir}/{n}"
        if os.path.isdir(src):
            os.symlink(src, f"{scratch}/{n}")
    r = subprocess.run(["python3", "scripts/check.py", sfdir, scratch],
                       capture_output=True, text=True)
    lines = r.stdout.strip().splitlines()
    failed = [l for l in lines if l.startswith("FAILED")]
    tail = failed[-1] if failed else "NO-FAILED-LINE (killed?)"
    print(f"batch {bi} ({len(batch)} queries) rc={r.returncode}: {tail}")
    if r.returncode != 0 or tail != "FAILED: none":
        all_ok = False
        print(r.stdout[-3000:])
        print(r.stderr[-2000:])
print("ALL-OK" if all_ok else "SOME-FAILED")
