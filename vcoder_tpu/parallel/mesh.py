"""Device-mesh construction and the active-mesh context.

The reference scales via DeepSpeed ZeRO-2/3 data parallelism over NCCL
(reference: scripts/zero*.json, scripts/v1_5/*.sh deepspeed launcher;
SURVEY.md §2.3). The TPU-native equivalent is a named
:class:`jax.sharding.Mesh` with three logical axes:

* ``data``  — pure data parallelism (batch sharding),
* ``fsdp``  — parameter/optimizer sharding gathered at use (ZeRO-3 analog),
* ``model`` — tensor parallelism over attention heads / MLP width
  (additive TPU capability for 13B serving; the reference has none,
  SURVEY.md §2.3).

Collectives are never written by hand: parameter and batch shardings are
declared with ``NamedSharding`` and XLA inserts all-gather / reduce-scatter /
all-reduce over ICI.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXES = ("data", "fsdp", "model")

# Thread-local: concurrent engine/train threads must not see (or pop)
# each other's active mesh.
import threading as _threading

_TLS = _threading.local()


def _mesh_stack() -> list:
    stack = getattr(_TLS, "mesh_stack", None)
    if stack is None:
        stack = _TLS.mesh_stack = []
    return stack


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    *,
    data: Optional[int] = None,
    fsdp: Optional[int] = None,
    model: Optional[int] = None,
) -> Mesh:
    """Build a ``(data, fsdp, model)`` mesh over the available devices.

    Unspecified axes default to 1 except ``fsdp``, which absorbs the
    remaining device count (ZeRO-3-style sharding is the default scaling
    mode, matching the reference's DeepSpeed stage-3 configs).
    """
    if devices is None:
        devices = jax.devices()
    sizes = {"data": data, "fsdp": fsdp, "model": model}
    fixed = {k: v for k, v in sizes.items() if v is not None}
    prod_fixed = int(np.prod(list(fixed.values()))) if fixed else 1
    if len(fixed) == 3:
        # Fully specified: take exactly that many devices.
        if prod_fixed > len(devices):
            raise ValueError(
                f"requested {fixed} needs {prod_fixed} devices,"
                f" have {len(devices)}"
            )
        devices = devices[:prod_fixed]
    n = len(devices)
    if n % prod_fixed != 0:
        raise ValueError(f"{n} devices not divisible by {fixed}")
    free = [k for k in AXES if sizes[k] is None]
    remaining = n // prod_fixed
    for k in free:
        if k == "fsdp":
            sizes[k] = remaining
            remaining = 1
        else:
            sizes[k] = 1
    if remaining != 1:
        # No free fsdp axis took the remainder: sizes must already multiply
        # out to n.
        raise ValueError(
            f"Axis sizes {sizes} do not cover {n} devices"
        )
    shape = tuple(sizes[k] for k in AXES)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def single_device_mesh() -> Mesh:
    """Degenerate 1x1x1 mesh (single-chip serving/bench)."""
    return make_mesh(jax.devices()[:1], data=1, fsdp=1, model=1)


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    """Make ``mesh`` the framework-wide active mesh.

    Model code (e.g. the attention dispatcher) consults
    :func:`current_mesh` to decide whether kernels must be shard_map'ped
    over the mesh instead of relying on GSPMD auto-partitioning (Pallas
    calls are opaque to the SPMD partitioner).
    """
    stack = _mesh_stack()
    stack.append(mesh)
    try:
        with mesh:
            yield mesh
    finally:
        stack.pop()


def current_mesh() -> Optional[Mesh]:
    stack = _mesh_stack()
    return stack[-1] if stack else None
