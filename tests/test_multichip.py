"""Multi-chip sharding dry run + driver entry-point checks, on the virtual
8-device CPU mesh the conftest sets up."""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_lowers():
    """entry() must be jittable (lower only; full compile is covered by the
    driver's own check)."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = fn.trace(*args).lower()
    assert lowered is not None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.slow
def test_dryrun_multichip_8(monkeypatch):
    # small scene for the fast test lane; the driver runs the default
    # (n_cells=10, 12K tets) for the round artifact
    monkeypatch.setenv("IPC_DRYRUN_CELLS", "3")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_shard_mesh_data_padding():
    from ipc_tpu.mesh import build_mesh
    from ipc_tpu.models.primitives import cube
    from ipc_tpu.parallel.sharding import make_mesh, shard_mesh_data

    V, T = cube(1)  # 6 tets -> padded to 8 on an 8-device mesh
    mesh, meta = build_mesh(V, T)
    dm = make_mesh(8)
    sharded = shard_mesh_data(mesh, dm)
    assert sharded.tets.shape[0] % 8 == 0
    # padded tets are inert: zero volume
    assert float(np.asarray(sharded.vol)[6:].sum()) == 0.0
    # elasticity over the padded mesh equals the unpadded value
    from ipc_tpu.energy.elasticity import elasticity_energy
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = np.asarray(mesh.x_rest) + rng.uniform(-0.05, 0.05, (len(V), 3))
    e0 = float(elasticity_energy(jnp.asarray(x), mesh))
    e1 = float(elasticity_energy(jnp.asarray(x), sharded))
    np.testing.assert_allclose(e1, e0, rtol=1e-12)
