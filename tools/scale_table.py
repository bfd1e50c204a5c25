#!/usr/bin/env python3
"""Builder-side: turn BenchSet output for two fixture dirs into the
BENCH_SF1 ratio table. Flags ratios > 10x (superlinear for a 10x
fixture) and failures.

Usage: python3 tools/scale_table.py benchset.log sf01_dir sf1_dir [flag_ratio]
"""
import re, sys

log, d_small, d_big = sys.argv[1], sys.argv[2], sys.argv[3]
flag = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0

times, failed = {}, set()
for line in open(log):
    m = re.match(r"\[benchset\] (\S+) (\S+) ([0-9.]+) s \(min of", line)
    if m:
        times[(m.group(1), m.group(2))] = float(m.group(3))
        continue
    m = re.match(r"\[benchset\] (\S+) (\S+) FAILED", line)
    if m:
        failed.add((m.group(1), m.group(2)))

names = sorted({q for q, _ in list(times) + list(failed)})
rows = []
for q in names:
    a, b = times.get((q, d_small)), times.get((q, d_big))
    if (q, d_small) in failed or (q, d_big) in failed or a is None or b is None:
        rows.append((float("inf"), q, a, b, "FAILED"))
        continue
    r = b / a if a > 0 else float("inf")
    rows.append((r, q, a, b, f"{r:.1f}x"))
rows.sort(reverse=True)

print(f"| sf0.1 s | sf1 s | ratio | query |")
print("|---|---|---|---|")
n_flag = 0
for r, q, a, b, label in rows:
    mark = " **FLAG**" if label != "FAILED" and r > flag else ""
    if mark or label == "FAILED":
        n_flag += 1
    aa = f"{a:.2f}" if a is not None else "-"
    bb = f"{b:.2f}" if b is not None else "-"
    print(f"| {aa} | {bb} | {label}{mark} | {q} |")
sys.stderr.write(f"{len(names)} queries, {n_flag} flagged (> {flag}x or failed)\n")
