"""Multi-chip SPMD rendering over a device mesh.

The reference is strictly single-threaded (SURVEY.md section 2: no parallelism of any
kind), so the distribution strategy here is designed TPU-first rather than ported:

* axis ``frame`` — data parallelism over a batch of cameras (independent frames:
  multi-view rendering, or the serving analog of batch inference);
* axis ``fb`` — the framebuffer sharded by horizontal row bands (the renderer's
  sequence/spatial parallelism: each device rasterizes its band against the full,
  replicated triangle setup table — triangle setup is tiny, pixels are the work).

Geometry (vertex transform, clip prepass, setup) is recomputed per device instead of
communicated: for this workload it is ~10^4 flops vs ~10^8 pixel-flops, so replicating
it avoids all gather traffic; the only cross-device "communication" is the implicit
output layout (each device owns its band, no collective needed in the forward path).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import DEFAULT_CONFIG, RenderConfig
from ..renderer import build_setup


def make_mesh(n_frame: int = 1, n_fb: Optional[int] = None,
              devices=None) -> Mesh:
    """Build a (frame, fb) mesh from the first n_frame * n_fb visible devices."""
    devices = devices if devices is not None else jax.devices()
    if n_fb is None:
        n_fb = len(devices) // n_frame
    n = n_frame * n_fb
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(n_frame, n_fb)
    return Mesh(grid, axis_names=("frame", "fb"))


@partial(jax.jit, static_argnames=("width", "height", "config", "mesh",
                                   "band_rows", "chunk", "backend", "interpret"))
def render_batch_sharded(
    dev: Dict[str, jnp.ndarray],
    matrices: jnp.ndarray,     # (B, 3, 4) camera batch, B % mesh.frame == 0
    *,
    width: int,
    height: int,
    config: RenderConfig = DEFAULT_CONFIG,
    mesh: Mesh,
    band_rows: int = 8,
    chunk: int = 16,
    backend: str = "xla",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a camera batch over the mesh; returns (pixels (B, H, W) uint32,
    depth (B, H, W) f32), sharded P('frame', 'fb', None)."""
    from ..ops.raster_pallas import rasterize_pallas_batch
    from ..ops.raster_xla import rasterize

    n_fb = mesh.shape["fb"]
    n_frame = mesh.shape["frame"]
    if height % n_fb:
        raise ValueError(f"height {height} not divisible by fb axis {n_fb}")
    if matrices.shape[0] % n_frame:
        raise ValueError(
            f"camera batch {matrices.shape[0]} not divisible by frame axis {n_frame}")
    local_h = height // n_fb
    if backend == "pallas" and local_h % 8:
        raise ValueError(f"pallas backend needs 8-row-aligned shards, got {local_h}")

    def shard_fn(dev_rep, m_local):
        y0 = jax.lax.axis_index("fb") * local_h

        if backend == "pallas":
            # The local camera batch rides the kernel grid (a pallas_call
            # cannot be vmapped once compiled).
            setup = jax.vmap(lambda m: build_setup(
                dev_rep, m, width=width, height=height, config=config))(m_local)
            return rasterize_pallas_batch(
                setup, dev_rep["textures"], width=width, height=local_h,
                background=config.background_packed, y_offset=y0,
                interpret=interpret, sampling=config.sampling,
            )

        def one_frame(m):
            setup = build_setup(dev_rep, m, width=width, height=height,
                                config=config)
            return rasterize(
                setup, dev_rep["textures"], width=width, height=local_h,
                background=config.background_packed, band_rows=band_rows,
                chunk=chunk, y_offset=y0, sampling=config.sampling,
            )

        return jax.vmap(one_frame)(m_local)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), dev), P("frame")),
        out_specs=P("frame", "fb", None),
        # pallas_call outputs carry no varying-mesh-axis annotation; skip the
        # vma check (outputs are explicitly laid out by out_specs anyway).
        check_vma=False,
    )
    return fn(dev, matrices)


class ShardedRenderer:
    """Multi-device front-end mirroring Renderer's API for camera batches."""

    def __init__(self, scene, config: RenderConfig = DEFAULT_CONFIG,
                 mesh: Optional[Mesh] = None, backend: str = "xla") -> None:
        from ..renderer import scene_to_device

        scene.validate()
        self.config = config
        self.backend = backend
        self.mesh = mesh if mesh is not None else make_mesh(1, len(jax.devices()))
        self.dev = scene_to_device(scene)

    def render_batch(self, matrices: np.ndarray, width: int, height: int):
        interpret = (self.backend == "pallas"
                     and jax.default_backend() not in ("tpu", "axon"))
        out = render_batch_sharded(
            self.dev, jnp.asarray(matrices, jnp.float32),
            width=width, height=height, config=self.config, mesh=self.mesh,
            backend=self.backend, interpret=interpret,
        )
        return out
