"""Hardware-path sort tests — run only on a real TPU backend (the CPU suite
covers the same contracts in interpret mode; these validate the compiled
Mosaic kernels at sizes interpret mode cannot reach)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wgpu_3dgs_viewer_app_tpu.ops.sort import BLOCK, merge_sort

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() != "tpu", reason="requires TPU hardware"
    ),
]

SENT = 0xFFFFFFFF


@pytest.mark.parametrize("nblocks,frac", [(16, 0.44), (256, 0.5)])
def test_merge_sort_tpu(nblocks, frac):
    rng = np.random.default_rng(11)
    e = nblocks * BLOCK
    k = rng.integers(0, 1 << 20, e, dtype=np.uint32)
    k[rng.random(e) < frac] = SENT
    p1 = np.arange(e, dtype=np.uint32)
    ks, s1, *_ = merge_sort(*(jnp.asarray(a) for a in (k, p1, p1, p1)))
    ks, s1 = np.asarray(ks), np.asarray(s1)
    nlive = int((k != SENT).sum())
    assert np.array_equal(np.sort(k[k != SENT]), ks[:nlive])
    assert np.all(ks[nlive:] == SENT)
    live = k != SENT
    assert sorted(zip(k[live].tolist(), p1[live].tolist())) == sorted(
        zip(ks[:nlive].tolist(), s1[:nlive].tolist())
    )


def test_merge_sort_interleaved_tpu():
    rng = np.random.default_rng(12)
    e = 128 * BLOCK
    k = rng.integers(0, 1 << 24, e, dtype=np.uint32)
    k[rng.random(e) < 0.44] = SENT
    p1 = np.arange(e, dtype=np.uint32)
    sk, inter = merge_sort(*(jnp.asarray(a) for a in (k, p1, p1, p1)),
                           interleaved=True)
    sk, inter = np.asarray(sk), np.asarray(inter)
    nlive = int((k != SENT).sum())
    assert np.array_equal(np.sort(k[k != SENT]), sk[:nlive])
    rows = nlive // 128
    assert np.array_equal(inter[:rows, 0, :].ravel(), sk[: rows * 128])
