"""Mid-run checkpoint / resume of the full SLAM state.

The reference has output-only persistence (SURVEY §5): map+poses on demand
and at shutdown, no mid-run resume.  Because our entire state is a pytree of
device arrays (keyframe store, factor graph, scheduler scalars, and — when
passed — the LIO front end's NavState/covariance/voxel map), true
checkpointing is one npz write — so we add it, as the SURVEY build plan
calls for.  Integrated-mode runs (``run.py --kitti --resume``) restore both
the pipeline and the LIO filter and continue mid-sequence.

Format: a single compressed npz of the pipeline's device state + a small
JSON-ish scalar block for the host-side scheduler state; the LIO state is
stored as its flattened pytree leaves (rebuilt against a template state
from the same config, which fixes the treedef and static shapes).
"""
from __future__ import annotations

import json

import numpy as np


def save_checkpoint(pipeline, path: str, lio_state=None, extra=None):
    st = pipeline.store
    g = pipeline.graph
    host = {
        "initialized": pipeline.initialized,
        "current_kf_idx": pipeline.current_kf_idx,
        "loop_added_flag": pipeline.loop_added_flag,
        "latest_kf_processed": pipeline.latest_kf_processed,
        "kf_processed": pipeline._kf_processed,
        "next_loop_tick": pipeline._next_loop_tick,
        "loop_idx_pairs": pipeline.loop_idx_pairs,
        "kf_timestamps": pipeline.kf_timestamps,
        "loop_events": [
            (e.tick_time, e.query_idx, e.closest_idx, e.score, e.accepted)
            for e in pipeline.loop_events
        ],
        "pending_loops": [
            {"query_idx": p["query_idx"], "closest_idx": p["closest_idx"],
             "meas": np.asarray(p["meas"]).tolist(),
             "score": float(p["score"]), "corr": p["corr"].tolist(),
             "committed": p["committed"]}
            for p in pipeline._pending_loops
        ],
        "extra": extra or {},
    }
    lio_arrays = {}
    if lio_state is not None:
        import jax

        leaves = jax.tree.leaves(lio_state)
        lio_arrays = {f"lio_leaf_{i}": np.asarray(leaf)
                      for i, leaf in enumerate(leaves)}
    np.savez_compressed(
        path,
        **lio_arrays,
        host_json=np.frombuffer(json.dumps(host).encode(), dtype=np.uint8),
        store_clouds=np.asarray(st.clouds),
        store_cloud_masks=np.asarray(st.cloud_masks),
        store_intensities=np.asarray(st.intensities),
        store_poses=np.asarray(st.poses),
        store_poses_corrected=np.asarray(st.poses_corrected),
        store_timestamps=np.asarray(st.timestamps),
        store_count=np.asarray(st.count),
        graph_poses=np.asarray(g.poses),
        graph_num_nodes=np.asarray(g.num_nodes),
        graph_prior_pose=np.asarray(g.prior_pose),
        graph_odom_meas=np.asarray(g.odom_meas),
        graph_loop_i=np.asarray(g.loop_i),
        graph_loop_j=np.asarray(g.loop_j),
        graph_loop_meas=np.asarray(g.loop_meas),
        graph_loop_var=np.asarray(g.loop_var),
        graph_num_loops=np.asarray(g.num_loops),
        last_odom_pose=np.asarray(pipeline.last_odom_pose),
        odom_delta=np.asarray(pipeline.odom_delta),
        last_corrected_pose=np.asarray(pipeline.last_corrected_pose),
        last_kf_corrected=np.asarray(pipeline.last_kf_corrected),
        # the pose lists hold per-keyframe DEVICE arrays (pipeline keeps
        # them unpulled to avoid a tunnel round trip per keyframe): stack
        # on device and pull ONCE, not one blocking transfer per element
        realtime_poses=_pull_pose_list(pipeline.realtime_poses),
        odom_poses=_pull_pose_list(pipeline.odom_poses),
    )


def _pull_pose_list(poses):
    if not poses:
        return np.zeros((0, 4, 4), np.float32)
    import jax.numpy as jnp

    return np.asarray(jnp.stack([jnp.asarray(p) for p in poses]))


def load_checkpoint(pipeline, path: str, lio_template=None):
    """Restore state into an already-constructed pipeline (capacities must
    match the checkpoint).

    lio_template: a LioState from LIO.init_state() with the SAME config as
    at save time; when given and the checkpoint holds LIO leaves, returns
    (pipeline, lio_state, extra) instead of just the pipeline."""
    import jax
    import jax.numpy as jnp

    from ..models.keyframes import KeyframeStore
    from ..models.pipeline import LoopEvent
    from ..ops.pgo import GraphState

    z = np.load(path)
    host = json.loads(bytes(z["host_json"]).decode())
    pipeline.store = KeyframeStore(
        clouds=jnp.asarray(z["store_clouds"]),
        cloud_masks=jnp.asarray(z["store_cloud_masks"]),
        intensities=jnp.asarray(
            z["store_intensities"] if "store_intensities" in z.files
            else np.zeros(z["store_cloud_masks"].shape, np.float32)),
        poses=jnp.asarray(z["store_poses"]),
        poses_corrected=jnp.asarray(z["store_poses_corrected"]),
        timestamps=jnp.asarray(z["store_timestamps"]),
        count=jnp.asarray(z["store_count"]),
    )
    pipeline.graph = GraphState(
        poses=jnp.asarray(z["graph_poses"]),
        num_nodes=jnp.asarray(z["graph_num_nodes"]),
        prior_pose=jnp.asarray(z["graph_prior_pose"]),
        odom_meas=jnp.asarray(z["graph_odom_meas"]),
        loop_i=jnp.asarray(z["graph_loop_i"]),
        loop_j=jnp.asarray(z["graph_loop_j"]),
        loop_meas=jnp.asarray(z["graph_loop_meas"]),
        loop_var=jnp.asarray(z["graph_loop_var"]),
        num_loops=jnp.asarray(z["graph_num_loops"]),
    )
    pipeline.initialized = host["initialized"]
    pipeline.current_kf_idx = host["current_kf_idx"]
    pipeline.loop_added_flag = host["loop_added_flag"]
    pipeline.latest_kf_processed = host["latest_kf_processed"]
    pipeline._kf_processed = list(host.get(
        "kf_processed", [True] * host["current_kf_idx"]))
    pipeline._next_loop_tick = host["next_loop_tick"]
    pipeline.loop_idx_pairs = [tuple(p) for p in host["loop_idx_pairs"]]
    pipeline.kf_timestamps = host["kf_timestamps"]
    pipeline.loop_events = [LoopEvent(*e) for e in host["loop_events"]]
    pipeline._pending_loops = [
        {"query_idx": p["query_idx"], "closest_idx": p["closest_idx"],
         "meas": jnp.asarray(p["meas"], jnp.float32),
         "score": jnp.float32(p["score"]),
         "corr": np.asarray(p["corr"]), "committed": p["committed"]}
        for p in host.get("pending_loops", [])
        if "meas" in p]  # pre-r3 checkpoints stored pose_between; their
        # pending (uncommitted) loops cannot be replayed faithfully — drop
    pipeline.last_odom_pose = jnp.asarray(z["last_odom_pose"])
    pipeline.odom_delta = jnp.asarray(z["odom_delta"])
    pipeline.last_corrected_pose = jnp.asarray(z["last_corrected_pose"])
    pipeline.last_kf_corrected = jnp.asarray(z["last_kf_corrected"])
    pipeline.realtime_poses = list(z["realtime_poses"])
    pipeline.odom_poses = list(z["odom_poses"])
    if lio_template is None:
        return pipeline
    extra = host.get("extra", {})
    n_leaves = len([k for k in z.files if k.startswith("lio_leaf_")])
    if n_leaves == 0:
        return pipeline, None, extra
    treedef = jax.tree.structure(lio_template)
    leaves = [jnp.asarray(z[f"lio_leaf_{i}"]) for i in range(n_leaves)]
    # static (non-array) leaves like SurfelMap.res round-trip as 0-d arrays;
    # restore them to the template's Python type
    tmpl_leaves = jax.tree.leaves(lio_template)
    if len(tmpl_leaves) == n_leaves + 2:
        # pre-r5 checkpoint without the LioState.ext extrinsic leaves
        # (appended last in the pytree): fill them from the template (the
        # configured extrinsic — exactly what the old filter was using)
        leaves = leaves + [jnp.asarray(t) for t in tmpl_leaves[-2:]]
        n_leaves += 2
    # shape-validate against the template so config mismatches fail HERE
    # with a clear message, not deep inside the first jitted scan — e.g. a
    # pre-r5 18x18 covariance resumed with extrinsic_est_en newly on
    for i, (t, leaf) in enumerate(zip(tmpl_leaves, leaves)):
        ts = getattr(t, "shape", None)
        if ts is not None and tuple(ts) != tuple(leaf.shape):
            raise ValueError(
                f"LIO checkpoint leaf {i} has shape {tuple(leaf.shape)} "
                f"but the config expects {tuple(ts)}: the checkpoint was "
                "saved with a different config (e.g. extrinsic_est_en or "
                "capacity changed) — resume with the saving config")
    if len(tmpl_leaves) != n_leaves:  # user-facing: must survive python -O
        raise ValueError(
            f"LIO checkpoint layout mismatch ({n_leaves} saved leaves vs "
            f"{len(tmpl_leaves)} in the template): the checkpoint was saved "
            "with a different config/map backend")
    leaves = [type(t)(leaf) if not hasattr(t, "shape") else leaf
              for t, leaf in zip(tmpl_leaves, leaves)]
    lio_state = jax.tree.unflatten(treedef, leaves)
    return pipeline, lio_state, extra
