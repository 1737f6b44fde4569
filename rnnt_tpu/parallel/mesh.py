"""Device mesh and sharding rules.

TPU-native replacement for the reference's distribution layer
(run_rnnt.py:93-131): where TF picked MirroredStrategy vs OneDeviceStrategy,
we build a `jax.sharding.Mesh` with ('data', 'model') axes and annotate
arrays with `NamedSharding`s — GSPMD then emits the XLA collectives (the
gradient all-reduce MirroredStrategy did implicitly via NCCL rides ICI here).

- data axis: batch sharding (pure DP — the reference's only strategy,
  run_rnnt.py:119-122).
- model axis: tensor parallelism for the wide LSTM/joint layers (absent in
  the reference, SURVEY.md §2.3; the gate matrices are column-sharded over
  their 4H output dim, projections row-sharded with an implicit psum, and the
  joint vocab projection column-sharded over V so the [B,T,U,V] lattice and
  the loss are V- and batch-sharded).

Multi-host: call `jax.distributed.initialize()` before `make_mesh`
(SURVEY.md §2.3 "multi-host"); each process feeds its local batch shard via
`jax.make_array_from_process_local_data`.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """Build a ('data', 'model') mesh. data=-1 means "all remaining devices"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names)


def data_read_group(mesh: Mesh):
    """(group_index, group_count): this process's slice of the input stream.

    Multi-host input must be split by DATA-ROW ownership, not by process:
    processes whose local devices sit in the same rows of the data axis hold
    replicas of the same batch rows (a model axis spanning processes), so
    they must read IDENTICAL data — splitting by process_index there would
    hand each replica different examples and silently corrupt the TP psums.
    Processes covering the same data rows share one read group; groups are
    pairwise disjoint in rows, so groups partition the stream exactly like
    process_index/process_count does in the pure-DP case (where each process
    owns its own rows and group == process).
    """
    rows = {}  # process_index -> row-index set
    dev = mesh.devices
    for r in range(dev.shape[0]):
        for d in dev[r].ravel():
            rows.setdefault(d.process_index, set()).add(r)
    groups = {}
    for p, rs in sorted(rows.items()):
        groups.setdefault(tuple(sorted(rs)), []).append(p)
    ordered = sorted(groups)
    # row sets must be identical-or-disjoint; a partially-overlapping split
    # (a data row whose devices straddle processes while siblings don't)
    # has no consistent host-side read assignment
    # ValueError, not assert: under `python -O` an assert vanishes and a
    # partially-overlapping layout would silently feed TP replicas different
    # data — exactly the corruption this check exists to prevent (ADVICE r3).
    for i, a in enumerate(ordered):
        for b in ordered[i + 1:]:
            if set(a) & set(b):
                raise ValueError(
                    f"unsupported mesh/process layout: data rows {a} and {b} "
                    f"partially overlap across processes — choose "
                    f"model_parallel so each data row lives in one process, "
                    f"or so whole rows are shared")
    # Each group must own a CONTIGUOUS, EQUAL-SIZE row block: eval pairs a
    # group's hypotheses with its references at global-row offset
    # group_index * local_batch_rows (train/loop.py), which is only the
    # group's first row under this layout.  A disjoint-but-interleaved
    # layout (rows {0,2}/{1,3}) would pass the overlap check yet silently
    # mispair hypotheses with references (ADVICE r4).
    for key in ordered:
        ks = list(key)
        if ks != list(range(ks[0], ks[0] + len(ks))):
            raise ValueError(
                f"unsupported mesh/process layout: read group rows {key} are "
                f"not a contiguous block — reorder the mesh devices so each "
                f"process group covers consecutive data rows")
    if len({len(k) for k in ordered}) > 1:
        raise ValueError(
            f"unsupported mesh/process layout: read groups own unequal row "
            f"counts {[len(k) for k in ordered]} — eval row pairing assumes "
            f"equal per-group batch shares")
    me = jax.process_index()
    for gi, key in enumerate(ordered):
        if me in groups[key]:
            return gi, len(ordered)
    return 0, 1  # this process hosts no mesh devices


def read_group_process_count(mesh: Mesh) -> int:
    """Number of processes sharing THIS process's read group (1 in pure DP;
    >1 when a model axis spans processes).  Eval statistics computed
    identically by every group member must be down-weighted by this factor
    before a cross-process sum, or groups with more processes bias the
    means (ADVICE r4)."""
    rows = {}
    dev = mesh.devices
    for r in range(dev.shape[0]):
        for d in dev[r].ravel():
            rows.setdefault(d.process_index, set()).add(r)
    me = jax.process_index()
    mine = rows.get(me)
    if mine is None:
        return 1
    return sum(1 for rs in rows.values() if rs == mine)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for input arrays (ref: run_rnnt.py:87-88)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Param-tree path -> PartitionSpec rules for tensor parallelism.
# Keys are regexes over '/'-joined tree paths.
_PARAM_RULES = [
    # LSTM gates: column-parallel over the 4H output dim.
    (r".*lstm/wx$", P(None, "model")),
    (r".*lstm/wh$", P(None, "model")),
    (r".*lstm/bias$", P("model")),
    # Output projection: row-parallel (psum inserted by GSPMD).
    (r".*lstm/wp$", P("model", None)),
    # Embedding: shard over embedding dim.
    (r".*embed$", P(None, "model")),
    # Joint: W1/b1 replicated — the fused joint+loss kernel consumes the
    # full J=joint_size activation per vocab shard (ops/joint_loss_fused
    # shard_map path), and at [P, J] they are tiny; the vocab projection
    # W2/b2 is column-parallel over V, which is where the joint's memory
    # and FLOPs live.
    (r".*joint/w2$", P(None, "model")),
    (r".*joint/b2$", P("model")),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def param_sharding_rules(mesh: Mesh, params):
    """NamedSharding pytree for a transducer param tree."""

    def rule(path, leaf):
        s = _path_str(path)
        for pat, spec in _PARAM_RULES:
            if re.match(pat, s):
                # Don't shard dims that aren't divisible by the axis size.
                sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
                ok = True
                for dim, axis in enumerate(spec):
                    if axis is None:
                        continue
                    if dim >= leaf.ndim or leaf.shape[dim] % sizes[axis] != 0:
                        ok = False
                if ok:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(mesh: Mesh, params):
    """Place a param tree onto the mesh according to the rules.

    Multi-process: leaves restored from a checkpoint arrive COMMITTED to
    local devices, and device_put from a committed array to a cross-process
    sharding demands backend cross-host transfer support (absent on CPU,
    needless here).  Decommitting to host numpy first takes the
    same-data-on-every-process path instead — each process materializes its
    own shards locally.
    """
    shardings = param_sharding_rules(mesh, params)
    if jax.process_count() > 1:
        params = jax.tree_util.tree_map(np.asarray, params)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
