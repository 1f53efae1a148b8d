"""AOT executable-cache management CLI.

The serving/eval/training pipelines persist compiled PJRT executables to
``.savsr_aot/`` (utils/aot.py). Entries are 77 MB (one serving shape/scale)
to 357 MB (the training step) each, so the cache needs a management
surface; the writer also auto-prunes past ``SAVSR_AOT_MAX_GB`` (default 20).

Usage:
  python -m savsr_tpu.aot list  [--dir D]
  python -m savsr_tpu.aot prune --max-gb N [--dir D]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    from .utils.aot import default_aot_dir, list_entries, prune_cache

    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    ap_list = sub.add_parser("list", help="list cache entries (LRU order)")
    ap_list.add_argument("--dir", default=None)
    ap_prune = sub.add_parser("prune", help="delete LRU entries past a size cap")
    ap_prune.add_argument("--max-gb", type=float, required=True)
    ap_prune.add_argument("--dir", default=None)
    args = ap.parse_args(argv)

    aot_dir = args.dir or default_aot_dir()
    entries = list_entries(aot_dir)
    total = sum(e["bytes"] for e in entries)

    if args.cmd == "list":
        print(f"{aot_dir}: {len(entries)} entries, {total / 1e9:.2f} GB")
        for e in entries:
            meta = e["meta"]
            age = time.strftime("%Y-%m-%d %H:%M", time.localtime(e["mtime"]))
            shapes = ", ".join(meta.get("args", [])[:4])
            print(f"  {e['bytes'] / 1e6:8.1f} MB  used {age}  "
                  f"tag={meta.get('tag', '?'):24s} jax={meta.get('jax_version', '?')}"
                  f"  [{shapes}]")
        return 0

    deleted = prune_cache(aot_dir, max_gb=args.max_gb)
    kept = sum(e["bytes"] for e in list_entries(aot_dir))
    print(f"pruned {len(deleted)} entries; cache now {kept / 1e9:.2f} GB "
          f"(cap {args.max_gb} GB)")
    for p in deleted:
        print(f"  deleted {p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
