"""Reference-parity parameter initialization.

The reference never sets initializers, so its layers use torch defaults:
kaiming_uniform(a=sqrt(5)) kernels and uniform(+-1/sqrt(fan_in)) biases
(torch.nn.Linear / Conv2d / Conv3d reset_parameters). flax defaults
(lecun_normal kernels, zero biases) start noticeably smaller, which
measurably slows early convergence on this detector (the real-drive A/B:
torch reached 3D AP@0.5 0.38 by epoch 8 where lecun-initialized runs were
still near 0). Matching the reference's init removes that confound.

torch's kaiming_uniform(a=sqrt(5)) bound works out to exactly
1/sqrt(fan_in) = uniform with variance (1/3)/fan_in, i.e. flax
variance_scaling(1/3, 'fan_in', 'uniform').
"""

from __future__ import annotations

import jax.numpy as jnp
from flax.linen import initializers

# kernels: kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform)
torch_kernel_init = initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")

# ConvTranspose: torch computes the fan from weight.size(1)*k^2 which for
# its (cin, cout, kh, kw) transposed weight is cout*k^2 — the OUT channel
# axis of the flax (kh, kw, cin, cout) kernel, i.e. 'fan_out'
torch_deconv_kernel_init = initializers.variance_scaling(
    1.0 / 3.0, "fan_out", "uniform")


def torch_bias_init(fan_in: int):
    """uniform(+-1/sqrt(fan_in)) — torch's reset_parameters bias rule.

    fan_in for Conv/Dense is cin * prod(kernel); torch computes the
    transposed-conv fan from the same (in-channel) axis of its weight.
    """
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        from jax import random

        return random.uniform(key, shape, dtype, -bound, bound)

    return init
