"""Merge chunked check_parity artifacts (tools/sweep_sf1.sh) into one
PARITY-style JSON. Usage: python tools/merge_parity.py OUT.json CHUNK.json..."""
import json
import sys

out_path = sys.argv[1]
merged = {"queries": {}}
for p in sys.argv[2:]:
    with open(p) as fh:
        d = json.load(fh)
    merged.setdefault("sf_dir", d.get("sf_dir"))
    merged["generated_unix"] = max(
        merged.get("generated_unix", 0), d.get("generated_unix", 0)
    )
    merged["queries"].update(d.get("queries", {}))
merged["n_queries"] = len(merged["queries"])
merged["n_match"] = sum(1 for r in merged["queries"].values() if r["match"])
with open(out_path, "w") as fh:
    json.dump(merged, fh, indent=1, sort_keys=True)
fails = sorted(k for k, r in merged["queries"].items() if not r["match"])
print(f"{merged['n_match']}/{merged['n_queries']} MATCH -> {out_path}")
if fails:
    print("FAILURES:", fails)
