"""Hardware tests: Pallas kernels vs jnp references on the real TPU chip.

Run manually (outside the CPU-forced main suite):
    python -m pytest tests/tpu -q -p no:cacheprovider --confcutdir=tests/tpu
or simply `python tests/tpu/test_pallas_tpu.py`.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def run():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    from pcaccumulation_tpu.kernels.chamfer import nn_bruteforce_ref, nn_pallas

    rng = np.random.default_rng(0)
    for n, m in ((1000, 2000), (5000, 4096), (300, 70000)):
        a = (rng.normal(size=(n, 3)) * 10).astype(np.float32)
        b = (rng.normal(size=(m, 3)) * 10).astype(np.float32)
        valid = rng.random(m) > 0.1

        d_ref, i_ref = nn_bruteforce_ref(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid))
        d_pal, i_pal = nn_pallas(jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid))

        np.testing.assert_allclose(
            np.asarray(d_pal), np.asarray(d_ref), rtol=1e-3, atol=1e-3
        )
        # argmins may differ on exact ties; distances at the chosen index
        # must match the min
        d_at = ((a - np.asarray(b)[np.asarray(i_pal)]) ** 2).sum(-1)
        np.testing.assert_allclose(d_at, np.asarray(d_ref), rtol=1e-3, atol=1e-3)
        print(f"nn_pallas parity OK for N={n}, M={m}")


if __name__ == "__main__":
    run()
    print("ALL TPU KERNEL TESTS PASSED")
