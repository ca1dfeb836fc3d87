"""cli/export_params: orbax run checkpoint -> flat npz round-trip."""
import jax
import jax.numpy as jnp
import numpy as np

from kpdiff_tpu.training.trainer import TrainState, save_checkpoint
from kpdiff_tpu.utils.params_io import load_params_npz


def test_export_latest_checkpoint(tmp_path):
    from kpdiff_tpu.cli.export_params import export

    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.ones(3)}}
    opt = {"mu": jnp.zeros(3)}
    for step in (3, 7):
        state = TrainState(params=jax.tree_util.tree_map(lambda x: x * step, params),
                           opt_state=opt, step=jnp.asarray(step, jnp.int32))
        save_checkpoint(tmp_path / "checkpoints", state, step=step)

    out = tmp_path / "params.npz"
    got_step = export(tmp_path, out)
    assert got_step == 7  # picks the newest

    restored = load_params_npz(out, params)
    np.testing.assert_array_equal(restored["dense"]["kernel"],
                                  np.arange(6.0).reshape(2, 3) * 7)
    np.testing.assert_array_equal(restored["dense"]["bias"], np.ones(3) * 7)
