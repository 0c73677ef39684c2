"""The SHIPPED sort knobs must pass off-chip (VERDICT r3 item 4).

The CPU suite pins GS_SORT_BLOCK_ROWS=128 / GS_MERGE_CHUNK_ROWS=256 for
speed (tests/conftest.py), which left the product defaults (256/512,
hardware-swept 2026-08-19 — ops/sort.py) exercised ONLY by manual on-chip
validation. This test re-runs the merge sort end-to-end in a subprocess
with the knob env CLEARED, so the module defaults — 256-row mixed-layout
blocks with subtile direction bits, 512-row merge cells and their piece
DMA geometry — are covered by `pytest tests/ -q` on every CPU run.

Reference parity anchor: the sort replaces the crate's GPU radix sorter
(`/root/reference/src/tab/scene.rs:865-869`); contract as in test_sort.py.
"""

import os
import subprocess
import sys

_CHILD = r"""
import numpy as np
import jax.numpy as jnp

from wgpu_3dgs_viewer_app_tpu.ops import sort as S

# Env cleared => module defaults. Keep the literals in sync with sort.py;
# a default change must consciously update this test.
assert S.BLOCK_ROWS == 256 and S.CHUNK_ROWS == 512, (S.BLOCK_ROWS, S.CHUNK_ROWS)

e = 4 * S.BLOCK  # 4 blocks -> 2 merge levels through the 512-row cells
rng = np.random.default_rng(11)
k = rng.integers(0, 1 << 24, e, dtype=np.uint32)
k[rng.random(e) < 0.4] = 0xFFFFFFFF  # sentinel slack, as culling produces
p1 = np.arange(e, dtype=np.uint32)
p2 = rng.integers(0, 2**32, e, dtype=np.uint32)
p3 = rng.integers(0, 2**32, e, dtype=np.uint32)

ks, s1, s2, s3 = S.merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                              interpret=True)[:4]
ks, s1, s2, s3 = (np.asarray(a).ravel() for a in (ks, s1, s2, s3))
live = k != 0xFFFFFFFF
nlive = int(live.sum())
assert ks.shape[0] >= e
assert np.array_equal(np.sort(k[live]), ks[:nlive]), "live keys not sorted"
assert np.all(ks[nlive:] == 0xFFFFFFFF), "tail not sentinel"
assert sorted(zip(k[live].tolist(), p1[live].tolist())) == sorted(
    zip(ks[:nlive].tolist(), s1[:nlive].tolist())), "key/payload pairing"
perm = s1[:nlive]
assert np.array_equal(p2[perm], s2[:nlive])
assert np.array_equal(p3[perm], s3[:nlive])
print("OK")
"""


def test_merge_sort_shipped_default_knobs():
    env = os.environ.copy()
    env.pop("GS_SORT_BLOCK_ROWS", None)
    env.pop("GS_MERGE_CHUNK_ROWS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # One host CPU device is enough; drop the 8-device flag to keep the
    # interpret run fast.
    env.pop("XLA_FLAGS", None)
    p = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                       capture_output=True, text=True, timeout=1200)
    assert p.returncode == 0, p.stderr[-4000:]
    assert "OK" in p.stdout
