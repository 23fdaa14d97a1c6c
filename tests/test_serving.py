"""Sealed-artifact serving tests: export → deserialize → exact parity."""

import pytest

# slow tier: jax.export round trips (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from stain2stain_tpu.models import UNetModel
from stain2stain_tpu.ops.solvers import SolverConfig
from stain2stain_tpu.serving import export_generator, load_generator
from stain2stain_tpu.tasks import ConditionalFlowMatchingModule


def test_export_generator_round_trip(tmp_path):
    net = UNetModel(
        dim=(3, 16, 16), num_channels=8, num_res_blocks=1, channel_mult=(1, 2),
        attention_resolutions="", num_heads=1,
    )
    task = ConditionalFlowMatchingModule(net=net, solver=SolverConfig("euler"))
    src = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = task.init_variables(jax.random.key(0), (src,))

    path = export_generator(
        task, variables, tmp_path / "gen.stablehlo", batch=2, image_size=16, num_steps=4
    )
    assert path.exists() and path.with_suffix(".stablehlo.json").exists()

    gen = load_generator(path)
    out = gen(src)
    ref = task.generate(variables, src, num_steps=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
