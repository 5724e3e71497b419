#!/usr/bin/env python3
"""Adversarially skewed events variant (VERDICT r6 item 6).

Rewrites <src>/events.parquet so ONE user holds ~30% of all rows (the
power-law hot-entity case AQE's skew-join split and graft.ops.Skew's
salting exist for), preserving every other column bit-for-bit. The
selection is deterministic (event_id % 10 < 3) so repeated generations
are identical. `props` already carries per-row variable strings, so the
hot key's partition does NOT compress away to nothing — the failure
mode that hid real skew from AQE's byte-based detector on constant-key
synthetic rows (NOTES/verify-skill gotcha).

Usage: python3 tools/skew_gen.py [src] [dst] [hot_user]
       python3 tools/skew_gen.py .scale/sf1 .scale/sf1skew
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main(src=".scale/sf1", dst=".scale/sf1skew", hot_user=7):
    os.makedirs(dst, exist_ok=True)
    t = pq.read_table(os.path.join(src, "events.parquet"))
    # event_id % 10 < 3 → 30%, deterministic (ids are offset per scale
    # copy by a multiple of 10... the stride 2^33 is not, so use
    # subtraction-based mod which pyarrow lacks as `modulo`).
    ten = pc.multiply(pc.divide(t["event_id"], 10), 10)
    hot = pc.less(pc.subtract(t["event_id"], ten), 3)
    user = pc.if_else(hot, pa.scalar(int(hot_user), pa.int64()), t["user_id"])
    out = pa.table([user if name == "user_id" else t[name]
                    for name in t.column_names], names=t.column_names)
    rg = max(10_000, len(out) // 32)  # same many-row-group layout as scale_gen
    pq.write_table(out, os.path.join(dst, "events.parquet"), row_group_size=rg)
    n_hot = pc.sum(pc.cast(pc.equal(user, hot_user), pa.int64())).as_py()
    print(f"events: {len(out)} rows, hot user {hot_user} = {n_hot} rows "
          f"({100.0 * n_hot / len(out):.1f}%)")


if __name__ == "__main__":
    main(*sys.argv[1:4])
