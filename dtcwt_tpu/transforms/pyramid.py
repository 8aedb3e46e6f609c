"""The transform-domain container: a JAX pytree.

Parity surface: ``/root/reference/dtcwt/numpy/common.py:5-33`` (attributes
``lowpass``, ``highpasses``, ``scales``).  Unlike the reference's three
backend-specific containers (NumPy arrays / OpenCL device handles / lazy TF
graph ops), there is exactly one Pyramid here: a registered pytree, so it
flows through ``jit`` / ``vmap`` / ``shard_map`` / optimizers untouched and
device placement is owned by XLA.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

__all__ = ["Pyramid"]


@jax.tree_util.register_pytree_node_class
class Pyramid:
    """A DTCWT pyramid.

    :ivar lowpass: coarsest-scale real lowpass image/signal/volume.
    :ivar highpasses: tuple of per-level complex subband arrays
        (``[..., H_l, W_l, 6]`` in 2-D, ``[..., N_l]`` in 1-D,
        ``[..., D_l, H_l, W_l, 28]`` in 3-D).
    :ivar scales: optional tuple of intermediate lowpass images (present
        when the transform ran with ``include_scale=True``).
    """

    __slots__ = ("lowpass", "highpasses", "scales")

    def __init__(self, lowpass, highpasses: Tuple, scales: Optional[Tuple] = None):
        self.lowpass = lowpass
        self.highpasses = tuple(highpasses)
        self.scales = None if scales is None else tuple(scales)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.lowpass, self.highpasses, self.scales), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        lowpass, highpasses, scales = children
        return cls(lowpass, highpasses, scales)

    # -- conveniences --------------------------------------------------------
    @property
    def nlevels(self) -> int:
        return len(self.highpasses)

    def block_until_ready(self):
        jax.block_until_ready((self.lowpass, self.highpasses, self.scales))
        return self

    def __repr__(self):
        hp = ", ".join(str(tuple(h.shape)) for h in self.highpasses)
        return "Pyramid(lowpass={}, highpasses=[{}]{})".format(
            tuple(self.lowpass.shape), hp,
            "" if self.scales is None else ", scales=%d" % len(self.scales))


def pyramid_to_device(p: Pyramid) -> Pyramid:
    """Move a (possibly host-side, possibly complex) pyramid onto the device
    via :func:`dtcwt_tpu.utils.asdevice` (complex host arrays transfer as
    real/imag planes on backends without complex DMA support)."""
    from dtcwt_tpu.utils import asdevice
    return Pyramid(asdevice(p.lowpass),
                   tuple(None if h is None else asdevice(h)
                         for h in p.highpasses),
                   None if p.scales is None
                   else tuple(asdevice(s) for s in p.scales))
