"""ES ``scripted_metric`` aggregation, Ray-Data-shaped.

ES runs init/map per shard document, combine per shard, reduce on the
coordinator.  Here the map script is a VECTORIZED batch function (the
per-doc Painless loop re-expressed over Arrow columns — the only honest
translation at 10^12-doc scale), one state per batch stands in for the
per-shard combine, and reduce folds the batch states on the driver.
States must be constant-size dicts (ES requires the same: shard states
are serialized to the coordinator), so the driver fold is O(batches)
tiny dicts regardless of corpus size.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa
import ray.data


def scripted_metric(
    ds: ray.data.Dataset,
    map_script: Callable[[pa.Table], dict[str, Any]],
    combine_script: Callable[[dict, dict], dict],
    reduce_script: Callable[[dict], Any],
    init_state: dict | None = None,
) -> Any:
    """Run the scripted-metric pipeline and return ``reduce_script``'s
    value.

    ``map_script(batch) -> state``: one constant-size dict per Arrow
    batch (vectorize the ES map_script).  ``combine_script(a, b) ->
    state``: associative fold of two states.  ``reduce_script(state) ->
    result``: the coordinator-side finish.  ``init_state`` seeds the
    fold (and is the result's input when the dataset is empty).
    """
    states = ds.map_batches(
        lambda b: pa.table({"state": pa.array([_pack(map_script(b))])}),
        batch_format="pyarrow",
    ).take_all()
    acc = None if init_state is None else dict(init_state)
    for row in states:
        st = _unpack(row["state"])
        acc = st if acc is None else combine_script(acc, st)
    return reduce_script(acc if acc is not None else {})


def _pack(state: dict) -> str:
    import json

    return json.dumps(state, sort_keys=True)


def _unpack(raw: str) -> dict:
    import json

    return json.loads(raw)
