"""Train + ship the default BoW vocabulary (k=10, L=4, 10k leaves).

Renders diverse random viewpoints of the synthetic scene, extracts ORB
descriptors, runs hierarchical binary k-medians (backend/vocabulary.train),
and writes gdslam_tpu/data/vocab_default.npz.

Usage: python tools/train_vocab.py [n_frames] [levels]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from gdslam_tpu.backend import vocabulary as voc
    t0 = time.time()
    v = voc.train_from_synthetic(k=10, levels=levels, n_frames=n_frames)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "gdslam_tpu", "data", "vocab_default.npz")
    voc.save(v, os.path.abspath(path))
    print(f"trained k=10 L={levels} ({v.n_leaves} leaves) on {n_frames} "
          f"frames in {time.time() - t0:.1f}s -> {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
