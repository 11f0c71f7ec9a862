"""REAL multi-process distributed test (SURVEY §4 MultiProcessTestCase
analogue, beyond the single-process virtual mesh in conftest): two OS
processes form a jax.distributed cluster over localhost, build a global
mesh spanning both, and run psum / data-parallel gradient steps whose
results must agree with the single-process computation.
"""
import os
import os.path as osp
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["D3M_REPO"])
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)   # 2 local devices/process

    from deep3dmap_tpu.parallel.mesh import init_dist, get_dist_info

    init_dist(coordinator_address=os.environ["D3M_COORD"],
              num_processes=2, process_id=int(os.environ["D3M_RANK"]))
    rank, world = get_dist_info()
    assert world == 2, world
    assert len(jax.devices()) == 4, jax.devices()   # global device view

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental import multihost_utils

    mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))

    # global data-parallel array: each process contributes its local shard
    local = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100 * rank
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P("data"))

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    with mesh:
        s = global_sum(garr)
    total = float(jax.device_get(s))
    expect = float(np.arange(6).sum() * 2 + 100 * 1 * 6)
    assert abs(total - expect) < 1e-5, (total, expect)

    # psum across ALL devices of both processes via shard_map
    from jax import shard_map
    ones = multihost_utils.host_local_array_to_global_array(
        np.ones((2, 1), np.float32), mesh, P("data"))
    f = shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                  in_specs=P("data"), out_specs=P())
    with mesh:
        out = jax.jit(f)(ones)
    np.testing.assert_allclose(np.asarray(jax.device_get(out)), 4.0)

    print(f"RANK{rank} OK", flush=True)
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for rank in range(2):
        env = dict(os.environ, D3M_REPO=REPO, D3M_COORD=coord,
                   D3M_RANK=str(rank))
        env.pop("XLA_FLAGS", None)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"rank {rank} timed out:\n{out[-2000:]}")
        outs.append(out)
        assert p.returncode == 0, f"rank {rank}:\n{out[-3000:]}"
    assert "RANK0 OK" in outs[0]
    assert "RANK1 OK" in outs[1]
