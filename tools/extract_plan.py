#!/usr/bin/env python3
"""Extract one query's `## name — note` section from a PLANS.md revision
into a file — used to pin plans/r17/<query>_{before,after}.txt from the
committed plan-audit artifact (the judge checks plan claims against
these)."""
import re, subprocess, sys

def section(text, name):
    out, on = [], False
    pat = re.compile(rf"^## {re.escape(name)}( — | — |$)")
    for l in text.splitlines():
        if l.startswith("## "):
            on = bool(pat.match(l))
        if on:
            out.append(l)
    return "\n".join(out) + "\n"

if __name__ == "__main__":
    rev, name, dest = sys.argv[1], sys.argv[2], sys.argv[3]
    if rev == "WORKTREE":
        text = open("PLANS.md").read()
    else:
        text = subprocess.check_output(["git", "show", f"{rev}:PLANS.md"], text=True)
    s = section(text, name)
    if len(s) < 10:
        sys.exit(f"section '{name}' not found in {rev}")
    open(dest, "w").write(s)
    print(f"wrote {dest} ({len(s)} bytes)")
