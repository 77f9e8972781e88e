"""Prune stale .jaxcache entries (round-3 advisor follow-up).

The persistent compile cache accumulates one blob per compiled executable;
entries for retired experiment shapes (old rows/S/dtype sweeps) never get
read again but sit in the repo forever.  Policy:

- entries TRACKED by git are the committed warm set for the driver bench
  and graft entry — never auto-deleted here;
- untracked entries older than --days (by mtime; default 7) are deleted.

Dry-run by default; pass --delete to act.

Usage: python experiments/jaxcache_gc.py [--days N] [--delete]
"""

import argparse
import subprocess
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
CACHE = ROOT / ".jaxcache"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=float, default=7.0)
    ap.add_argument("--delete", action="store_true")
    args = ap.parse_args()
    if not CACHE.is_dir():
        print("no .jaxcache directory")
        return 0
    tracked = set(
        subprocess.run(
            ["git", "ls-files", ".jaxcache"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout.split()
    )
    cutoff = time.time() - args.days * 86400
    total = freed = 0
    for f in sorted(CACHE.iterdir()):
        if not f.is_file():
            continue
        total += 1
        rel = str(f.relative_to(ROOT))
        if rel in tracked:
            continue
        if f.stat().st_mtime < cutoff:
            freed += f.stat().st_size
            print(("rm " if args.delete else "would rm ") + f.name)
            if args.delete:
                f.unlink()
    print(
        f"# {total} entries, {len(tracked)} tracked (kept), "
        f"{freed/1e6:.1f} MB {'freed' if args.delete else 'reclaimable'}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
