import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from gdslam_tpu.models import maskrcnn as mrc

hw = (96, 128)
rng = np.random.default_rng(1)
img = rng.uniform(0, 255, (2,) + hw + (3,)).astype(np.float32)
boxes = jnp.asarray([[[20.0, 30, 60, 80]], [[25.0, 35, 65, 85]]])
classes = jnp.full((2, 1), 3, jnp.int32)
masks = jnp.zeros((2,) + hw).at[:, 20:60, 30:80].set(1.0)
valids = jnp.ones((2, 1), bool)
model = mrc.MaskRCNN(image_hw=hw, blocks=(1, 1, 1, 1),
                     pre_nms=128, post_nms=16, max_det=8)
t0 = time.time()
variables = model.init(jax.random.PRNGKey(0), jnp.zeros(hw + (3,)))
print("init", time.time() - t0)

t0 = time.time()
out = model.apply(variables, jnp.asarray(img[0]), boxes[0],
                  classes[0], masks[0], valids[0],
                  method=mrc.MaskRCNN.train_losses_sampled)
print("fwd sampled", time.time() - t0)
for k, v in out.items():
    print(" ", k, float(v))

t0 = time.time()
trained, losses = mrc.train_sampled(
    model, variables, jnp.asarray(img), boxes, classes, masks,
    valids, steps=6, lr=1e-3, batch=2)
print("train_sampled 6 steps", time.time() - t0)
print("losses", losses)
