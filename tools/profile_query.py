"""Per-stage profile of any registry query: runs it and prints Ray Data's
operator-level stats (wall time, blocks, rows, memory per stage) so perf
work targets the dominant stage instead of guessing.

Usage: python tools/profile_query.py <query> [sf_dir] [num_cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from reddacted_ray.pipelines import queries as Q

    fn = Q.registry()[name]
    t0 = time.perf_counter()
    res = fn(sf_dir)
    if isinstance(res, rd.Dataset):
        res = res.materialize()
        wall = time.perf_counter() - t0
        print(res.stats())
    else:
        wall = time.perf_counter() - t0
        print(f"(driver-side result: {type(res).__name__},"
              " no dataset stats to show)")
    print(f"\n== {name} total wall: {wall:.3f} s (num_cpus={ncpu},"
          f" sf_dir={sf_dir})")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
