#!/usr/bin/env python3
"""Split `sbt "runMain graft.Explain all"` output into per-query plan files.

Usage: python3 tools/split_plans.py <explain_log> <outdir> <suffix>
e.g.   python3 tools/split_plans.py /tmp/explain_all.log plans/r06 after

Each query's section starts at a line `========== <name> ==========` and the
plan body is kept from its `== Physical Plan ==` marker onward, stripped of
sbt/log4j noise, matching the *_before.txt format.
"""
import re
import sys
import pathlib

log, outdir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
outdir.mkdir(parents=True, exist_ok=True)

name = None
buf = []
n = 0


def flush(name, buf):
    global n
    if name is None:
        return
    # keep from the "== Physical Plan ==" line on, drop trailing noise lines
    try:
        start = next(i for i, l in enumerate(buf) if l.startswith("== Physical Plan =="))
    except StopIteration:
        return
    body = [l for l in buf[start:]
            if not re.match(r"^\[(info|error|success|warn)\]", l)
            and "Total time:" not in l]
    # trim trailing blank lines
    while body and not body[-1].strip():
        body.pop()
    (outdir / f"{name}_{suffix}.txt").write_text("\n".join(body) + "\n")
    n += 1


for raw in open(log, errors="replace"):
    line = raw.rstrip("\n")
    # strip sbt's [error] prefix that wraps forked stderr/stdout if present
    line = re.sub(r"^\[(error|info)\] ", "", line)
    m = re.match(r"^=+ (q\w+) =+$", line)
    if m:
        flush(name, buf)
        name, buf = m.group(1), []
    elif name is not None:
        buf.append(line)
flush(name, buf)
print(f"wrote {n} plan files to {outdir} (suffix _{suffix})")
