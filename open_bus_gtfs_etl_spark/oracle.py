"""Trivially-correct single-threaded oracle for the CDC replay.

Folds the full change-event log (sorted by ``(lsn, ts)``) into a dict
keyed on ``(conv_id, turn_idx)`` — the semantics the distributed engine
must reproduce exactly: last-writer-wins per key, delete removes,
a later insert recreates (SURVEY.md §5 item 2; reference LWW analogue:
re-running a day's load overwrites tracked columns,
load_stops_to_db.py:56-61).
"""

from __future__ import annotations

import pandas as pd


def fold_events(events: pd.DataFrame) -> pd.DataFrame:
    """events: pandas DataFrame with columns lsn, op, ts, conv_id,
    turn_idx, role, text, tool. Returns the golden transcripts table
    sorted by (conv_id, turn_idx).

    Duplicate deliveries (same lsn twice) are harmless because the fold
    is idempotent per lsn; out-of-order segment delivery is irrelevant
    because the oracle sorts by the global lsn order.
    """
    ev = events.sort_values(["lsn", "ts"], kind="stable")
    state: dict[tuple[str, int], tuple] = {}
    for row in ev.itertuples(index=False):
        key = (row.conv_id, int(row.turn_idx))
        if row.op == "delete":
            state.pop(key, None)
        else:
            tool = getattr(row, "tool", None)
            state[key] = (row.role, row.text, None if pd.isna(tool) else tool, row.ts)
    rows = [
        {
            "conv_id": k[0],
            "turn_idx": k[1],
            "role": v[0],
            "text": v[1],
            "tool": v[2],
            "ts": v[3],
        }
        for k, v in state.items()
    ]
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return out.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
