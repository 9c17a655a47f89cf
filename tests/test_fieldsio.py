"""FieldsIO checkpoint/restart tests (mirrors reference
tests/test_helpers/test_fieldsIO.py strategy: write/read round trips and a
restart run that continues a previous one)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from pysdc_tpu.models.heat import HeatND
from pysdc_tpu.parallel.nonmpi import ControllerNonMPI
from pysdc_tpu.sweepers.generic_implicit import GenericImplicit
from pysdc_tpu.utils.fieldsio import FieldsIO, LogToFile, Rectilinear, Scalar


def test_scalar_roundtrip(tmp_path):
    fn = str(tmp_path / 'scalar.pysdc')
    io = Scalar(np.float64, fn)
    io.setHeader(nVar=5)
    io.initialize()
    rng = np.random.default_rng(0)
    fields = [rng.standard_normal(5) for _ in range(3)]
    for i, f in enumerate(fields):
        io.addField(0.1 * i, f)

    re = FieldsIO.fromFile(fn)
    assert re.nFields == 3
    assert np.allclose(re.times, [0.0, 0.1, 0.2])
    for i, f in enumerate(fields):
        t, data = re.readField(i)
        assert t == pytest.approx(0.1 * i)
        assert np.allclose(data, f)
    # negative indexing
    t, data = re.readField(-1)
    assert np.allclose(data, fields[-1])


def test_rectilinear_roundtrip(tmp_path):
    fn = str(tmp_path / 'rect.pysdc')
    io = Rectilinear(np.float32, fn)
    io.setHeader(nVar=2, coords=[np.linspace(0, 1, 8), np.linspace(0, 1, 4)])
    io.initialize()
    field = np.arange(2 * 8 * 4, dtype=np.float32).reshape(2, 8, 4)
    io.addField(0.5, field)

    re = FieldsIO.fromFile(fn)
    t, data = re.readField(0)
    assert data.shape == (2, 8, 4)
    assert np.allclose(data, field)
    assert re.gridSizes == [8, 4]


def test_vtr_export(tmp_path):
    fn = str(tmp_path / 'rect.pysdc')
    io = Rectilinear(np.float64, fn)
    io.setHeader(nVar=1, coords=[np.linspace(0, 1, 4), np.linspace(0, 1, 4)])
    io.initialize()
    io.addField(0.0, np.ones((1, 4, 4)))
    io.toVTR(str(tmp_path / 'out'), idx=0)
    assert os.path.exists(tmp_path / 'out_000000.vtr')


def test_checkpoint_restart_equivalence(tmp_path):
    """A run checkpointed at t=0.1 and restarted must match a straight run."""
    desc = dict(
        problem_class=HeatND,
        problem_params=dict(nvars=64, nu=0.1, freq=2, bc='periodic'),
        sweeper_class=GenericImplicit,
        sweeper_params=dict(num_nodes=3, QI='LU'),
        level_params=dict(dt=0.05, restol=1e-11),
        step_params=dict(maxiter=20),
    )

    # straight run to t=0.2
    c = ControllerNonMPI(1, {'logger_level': 40}, desc)
    P = c.MS[0].levels[0].prob
    u_direct, _ = c.run(P.u_exact(0.0), 0.0, 0.2)

    # checkpointed run to t=0.1 ...
    logger = LogToFile(str(tmp_path), P)
    c1 = ControllerNonMPI(1, {'logger_level': 40, 'hook_class': [logger.hook_class]}, desc)
    c1.run(P.u_exact(0.0), 0.0, 0.1)

    # ... restart from the last checkpoint and continue
    t_restart, u_restart = logger.load(-1)
    assert t_restart == pytest.approx(0.1)
    c2 = ControllerNonMPI(1, {'logger_level': 40}, desc)
    u_cont, _ = c2.run(jnp.asarray(u_restart.reshape(64)), t_restart, 0.2)

    assert float(jnp.max(jnp.abs(u_cont - u_direct))) < 1e-13


def test_sharded_collective_write_matches_host_write(tmp_path):
    """Device-sharded fields take the per-shard slab write path (the analog
    of the reference's MPI-IO collective writes, fieldsIO.py:505-560) and
    produce byte-identical records to a host-side write."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    rng = np.random.default_rng(7)
    data = rng.standard_normal((2, 16, 8))

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), axis_names=('a', 'b'))
    sharded = jax.device_put(jnp.asarray(data), NamedSharding(mesh, PartitionSpec(None, 'a', 'b')))
    assert len(sharded.sharding.device_set) == 8

    coords = [np.arange(16, dtype=float), np.arange(8, dtype=float)]
    io_sh = Rectilinear(np.float64, str(tmp_path / 'sharded.pysdc'))
    io_sh.setHeader(nVar=2, coords=coords)
    io_sh.initialize()
    io_sh.addField(0.5, sharded)
    io_sh.addField(1.5, 2 * sharded)

    io_host = Rectilinear(np.float64, str(tmp_path / 'host.pysdc'))
    io_host.setHeader(nVar=2, coords=coords)
    io_host.initialize()
    io_host.addField(0.5, data)
    io_host.addField(1.5, 2 * data)

    for idx in (0, 1):
        t_sh, f_sh = FieldsIO.fromFile(io_sh.file_name).readField(idx)
        t_ho, f_ho = FieldsIO.fromFile(io_host.file_name).readField(idx)
        assert t_sh == t_ho
        np.testing.assert_array_equal(np.asarray(f_sh), np.asarray(f_ho))
    # replicated arrays fall back to the plain path
    repl = jax.device_put(jnp.asarray(data), NamedSharding(mesh, PartitionSpec()))
    io_sh.addField(2.5, repl)
    t, f = FieldsIO.fromFile(io_sh.file_name).readField(2)
    np.testing.assert_allclose(np.asarray(f), data)
