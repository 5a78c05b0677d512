"""Streaming running top-k leaderboard — the second custom stateful
operator shape (running aggregates emitted every batch), complementing
sessionize's timeout-driven shape.

Per group, state is the running count per key; every micro-batch emits
the current top-k with a monotonically increasing version, so consumers
read the newest version per group for the live leaderboard and the
version history for its evolution. The final version equals the batch
``groupBy().count()`` top-k exactly (oracle-checked by the
stream_leaderboard query).

State size: O(distinct keys per group) — the honest cost of an exact
leaderboard. For unbounded key domains swap the dict for a space-saving
/ count-min summary inside the same operator shape; the emit contract is
unchanged (approximate counts, still mergeable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["running_topk"]


def running_topk(
    stream: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    k: int = 5,
) -> DataFrame:
    """(group, version, rank, key, n) — top-``k`` keys by running count in
    each group, re-emitted with a bumped version each micro-batch. Ties
    break on the smaller key (total order, deterministic across runs)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{group_col} string, version bigint, rank bigint, "
        f"{key_col} bigint, n bigint"
    )

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        ks, cs, version = state.get if state.exists else ([], [], 0)
        counts = dict(zip(ks, cs))
        for pdf in pdfs:
            if not len(pdf):
                continue
            for uid, c in pdf[key_col].value_counts().items():
                uid = int(uid)
                counts[uid] = counts.get(uid, 0) + int(c)
        if not counts:
            return
        version += 1
        state.update((list(counts), list(counts.values()), version))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        yield pd.DataFrame(
            {
                group_col: [key[0]] * len(top),
                "version": [version] * len(top),
                "rank": list(range(1, len(top) + 1)),
                key_col: [t[0] for t in top],
                "n": [t[1] for t in top],
            }
        )

    return stream.groupBy(group_col).applyInPandasWithState(
        _update,
        outputStructType=out_schema,
        stateStructType="ks array<bigint>, cs array<bigint>, v bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
