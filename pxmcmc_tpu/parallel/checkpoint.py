r"""Periodic checkpoint/resume of sampler runs.

Beyond-reference capability (SURVEY.md §5: the reference saves once after
``run()`` returns, so a crash loses everything).  A checkpoint captures the
full chain state pytree, the PRNG key, the sample counter, and the tracking
arrays accumulated so far; ``PxMCMC.run(checkpoint_path=...)`` resumes
exactly where it stopped.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..config import to_device, to_host

_META = "__meta__"


def _flatten_state(state):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def _summary_to_payload(summary) -> dict:
    """Flatten a device-side summary pytree (nested dicts of arrays) into
    path-named npz entries so resume restores ``track='summary'`` state."""
    out = {}
    if summary is None:
        return out
    for kp, leaf in jax.tree_util.tree_flatten_with_path(summary)[0]:
        name = "/".join(str(k.key) for k in kp)
        # to_host: complex leaves must cross the boundary as real planes
        # (config.py — a raw device_get of complex bytes poisons relayed
        # TPU clients)
        from .mesh import local_block

        out[f"summary/{name}"] = local_block(leaf)
    return out


def _summary_from_payload(z):
    """Rebuild the nested summary dict from path-named npz entries."""
    root = None
    for full in z.files:
        if not full.startswith("summary/"):
            continue
        if root is None:
            root = {}
        parts = full[len("summary/"):].split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        if parts[0] in ("map_X", "map_logpi"):
            # The running-MAP fold lives host-side (mcmc._fold_map keeps
            # numpy); round-tripping a complex map_X through to_device and
            # back would be exactly the raw complex readback config.to_host
            # exists to avoid on relayed TPU backends.
            d[parts[-1]] = np.asarray(z[full])
        else:
            d[parts[-1]] = to_device(z[full])
    return root


class AsyncCheckpointer:
    """Write checkpoints off the sampling loop's critical path.

    ``submit`` snapshots nothing eagerly: device arrays are immutable
    (functional updates make new arrays) and the host tracking buffers are
    append-only in ``[:j]`` (``_store_tracking`` writes strictly increasing
    row ranges), so holding references is a consistent snapshot.  The
    single worker thread then does the device->host fetch, the npz write,
    the fsync and the atomic rename — all overlapped with the next
    superblocks.  One outstanding write at a time (``submit`` joins the
    previous one first, which also surfaces its errors);
    call :meth:`wait` before finishing the run.  SURVEY.md §2b
    checkpoint/fault-tolerance row; the reference has no checkpointing at
    all (one save post-run, ``/root/reference/pxmcmc/saving.py:5-36``).
    ``PXMCMC_CHECKPOINT_SYNC=1`` reverts to in-loop writes.
    """

    def __init__(self):
        self._executor = None
        self._future = None

    @property
    def _sync(self) -> bool:
        return os.environ.get("PXMCMC_CHECKPOINT_SYNC", "0") == "1"

    def submit(self, path, state, key, j, tracking, summary=None):
        if self._sync:
            save_checkpoint(path, state, key, j, tracking, summary)
            return
        from concurrent.futures import ThreadPoolExecutor

        if self._executor is None:
            self._executor = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="pxmcmc-ckpt"
            )
        self.wait()
        self._future = self._executor.submit(
            save_checkpoint, path, state, key, j, tracking, summary
        )

    def wait(self):
        """Join the outstanding write (re-raising any write error)."""
        if self._future is not None:
            fut, self._future = self._future, None
            fut.result()


def save_checkpoint(path, state, key, j, tracking: dict, summary=None):
    """Atomically write a checkpoint npz."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    leaves, _ = _flatten_state(state)
    # local_block == to_host for single-process runs; under
    # jax.process_count() > 1 each process saves only its own contiguous
    # chain shard (the caller derives a per-process path), so no
    # non-addressable shard is ever touched.
    from .mesh import local_block

    payload = {f"state_{i}": local_block(x) for i, x in enumerate(leaves)}
    payload["key_data"] = np.asarray(jax.random.key_data(key))
    for name, arr in tracking.items():
        payload[f"track_{name}"] = arr
    payload.update(_summary_to_payload(summary))
    payload[_META] = np.frombuffer(
        json.dumps({"j": int(j), "nleaves": len(leaves), "tracks": list(tracking)}).encode(),
        dtype=np.uint8,
    )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def load_checkpoint(path, state_template):
    """Restore (state, key, j, tracking, summary) from a checkpoint.

    ``state_template`` supplies the pytree structure (and device placement /
    sharding via its leaves' shardings).  ``summary`` is None for runs
    without ``track='summary'``.
    """
    with np.load(path) as z:
        meta = json.loads(bytes(z[_META].tobytes()).decode())
        leaves, treedef = _flatten_state(state_template)
        new_leaves = []
        multiproc = jax.process_count() > 1
        for i, tmpl in enumerate(leaves):
            arr = z[f"state_{i}"]
            if multiproc and hasattr(tmpl, "sharding"):
                # arr holds this process's local chain shard; reassemble the
                # global array from per-process local data
                x = jax.make_array_from_process_local_data(
                    tmpl.sharding, np.asarray(arr, dtype=tmpl.dtype)
                )
            else:
                x = to_device(arr, dtype=tmpl.dtype)
                if hasattr(tmpl, "sharding"):
                    x = jax.device_put(x, tmpl.sharding)
            new_leaves.append(x)
        state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        key = jax.random.wrap_key_data(jax.numpy.asarray(z["key_data"]))
        tracking = {name: z[f"track_{name}"] for name in meta["tracks"]}
        summary = _summary_from_payload(z)
    return state, key, meta["j"], tracking, summary
