"""Scan all dumped plans for missed-reuse signatures:
- tree Generate count >= 2 (duplicate explode pipelines)
- multiple Scan parquet of the same file (multi-pass; sometimes by design)
- sibling Exchange nodes with identical hashpartitioning key NAMES (not ids)
"""
import os, re, collections

D = "/tmp/allplans"  # produced by dump_all_plans.py next to this file
for fn in sorted(os.listdir(D)):
    name = fn[:-4]
    txt = open(os.path.join(D, fn)).read()
    tree = txt.split("\n\n(1)")[0]
    gens = len(re.findall(r"\bGenerate \(\d+\)", tree))
    scans = re.findall(r"Location: InMemoryFileIndex \[file:([^\]]+)\]", txt)
    scan_dups = {p: c for p, c in collections.Counter(scans).items() if c > 1}
    # exchanges: collect normalized partitioning signatures from detail blocks
    exch = re.findall(r"Arguments: (hashpartitioning|rangepartitioning)\(([^)]*)\)", txt)
    def norm(cols):
        return tuple(sorted(re.sub(r"#\d+L?", "", c).strip() for c in cols.split(",") if "=" not in c and c.strip() and not c.strip().isdigit()))
    sigs = collections.Counter((kind, norm(cols)) for kind, cols in exch)
    dup_exch = {s: c for s, c in sigs.items() if c > 1}
    reused = txt.count("ReusedExchange")
    flags = []
    if gens >= 2: flags.append(f"gens={gens}")
    if scan_dups: flags.append("dupscan=" + ";".join(f"{os.path.basename(p)}x{c}" for p, c in scan_dups.items()))
    if dup_exch: flags.append("dupexch=" + ";".join(f"{k[0][:4]}({','.join(k[1])})x{v}" for k, v in dup_exch.items()))
    if flags:
        print(f"{name:28s} reused={reused:2d}  " + "  ".join(flags))
