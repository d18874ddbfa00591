"""Multi-host execution: two jax.distributed processes on one machine render
the sharded Cornell pass and must agree with the single-process result.

This is the standard way to test pod code without a pod (SURVEY.md §4): each
process owns 4 virtual CPU devices, jax.distributed.initialize() stitches
them into one 8-device global mesh over the loopback "DCN", and the same
shard_map render code runs unchanged. Process 0 checks its film half against
a locally-computed reference.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import sys

    import jax

    coord, pid = sys.argv[1], int(sys.argv[2])
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import numpy as np

    import luisarender_tpu as lr
    from luisarender_tpu import testing
    from luisarender_tpu.parallel.render import make_mesh, render_sharded

    res, spp, depth = 32, 2, 3
    scene = lr.Scene.from_dict(
        testing.cornell_box(resolution=(res, res), spp=spp, depth=depth)
    )
    compiled = lr.compile_scene(scene)
    from jax.experimental import multihost_utils

    mesh = make_mesh(jax.devices())  # 8 devices across the 2 processes
    img_global = render_sharded(
        compiled, scene.cameras[0], scene.integrator, mesh, spp=spp
    )
    # the film is row-sharded across processes: allgather to every host
    img = np.asarray(
        multihost_utils.process_allgather(img_global, tiled=True)
    )

    if pid == 0:
        ref_mesh = make_mesh(jax.local_devices()[:1])
        ref = np.asarray(jax.device_get(
            render_sharded(compiled, scene.cameras[0], scene.integrator,
                           ref_mesh, spp=spp)
        ))
        assert img.shape == ref.shape
        err = np.max(np.abs(img - ref))
        assert err < 1e-5, f"multi-host image mismatch: {err}"
        print("MULTIHOST-OK", img.mean())
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_render(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # skip the axon sitecustomize TPU registration entirely (verify SKILL.md)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert "MULTIHOST-OK" in outs[0]
