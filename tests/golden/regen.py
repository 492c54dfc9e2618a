"""Regenerate golden values after an intentional numerics change."""
import json
import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.train.bilinear import BilinearTrainer

rng = np.random.RandomState(42)
x = jnp.asarray(rng.randn(96, 32).astype(np.float32))
y = jnp.asarray(rng.randn(96, 48).astype(np.float32))
trainer = BilinearTrainer(batch_size=32)
state = trainer.init_state(jax.random.PRNGKey(7))
losses = []
for e in range(4):
    state, l = trainer.train_epoch(state, x, y, jax.random.PRNGKey(100 + e))
    losses.extend([float(v) for v in np.asarray(l)])
golden = {
    "losses": losses,
    "final_step": int(state.step),
    "decode_kernel_sum": float(jnp.sum(state.params["decode"]["kernel"])),
}
out = os.path.join(os.path.dirname(__file__), "bilinear_train.json")
with open(out, "w") as f:
    json.dump(golden, f, indent=1)
print("wrote", out)
