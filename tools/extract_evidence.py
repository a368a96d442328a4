"""Extract per-entry evidence from a batch log into a committed artifact
(VERDICT r4 weak #6: every device number quoted in docs must trace to a
repo-committed log, not a /tmp file).

Parses the `=== name === HH:MM:SS` section markers written by
tools/run_evidence_r*.sh, keeps each section's result JSON line (or its
last few output lines when there is no JSON), and writes both a
human-auditable .log tail file and a machine-readable rows.jsonl.

Usage: python tools/extract_evidence.py /tmp/evidence_r5a.log docs/evidence/r5a
"""
import json
import os
import re
import sys


def main():
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    with open(src, errors="replace") as f:
        lines = f.readlines()
    sections = []
    cur = None
    for ln in lines:
        m = re.match(r"^=== (.+) === (\d\d:\d\d:\d\d)", ln)
        if m:
            cur = {"name": m.group(1), "utc": m.group(2), "lines": []}
            sections.append(cur)
        elif cur is not None:
            cur["lines"].append(ln.rstrip("\n"))
    rows = []
    tail_out = []
    for s in sections:
        body = [ln for ln in s["lines"] if not ln.startswith("WARNING")]
        rc = next((ln for ln in body if re.match(r"^rc=\d+", ln)), None)
        metric = None
        for ln in body:
            if ln.startswith("{") and '"metric"' in ln:
                try:
                    metric = json.loads(ln)
                except ValueError:
                    pass
        rows.append({"entry": s["name"], "utc": s["utc"],
                     "rc": int(rc[3:]) if rc else None,
                     "result": metric})
        tail_out.append(f"=== {s['name']} === {s['utc']}")
        keep = [ln for ln in body if ln and not ln.startswith("{\"detail\"")]
        tail_out.extend(keep[-14:])
        tail_out.append("")
    with open(os.path.join(dst, "rows.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(dst, "tails.log"), "w") as f:
        f.write("\n".join(tail_out))
    print(f"{len(rows)} entries -> {dst}/rows.jsonl + tails.log")


if __name__ == "__main__":
    main()
