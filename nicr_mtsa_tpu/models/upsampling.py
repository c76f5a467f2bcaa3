"""Upsampling modules: nearest / bilinear / learned-3x3[-zeropad].

Reference model/upsampling.py:24-115. `learned-3x3` mimics bilinear
interpolation: nearest x2 upscale followed by a depthwise 3x3 conv
initialized to the bilinear kernel (replication padding; the
`-zeropad` variant uses zero padding)."""
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn


KNOWN_UPSAMPLING_METHODS = (
    'nearest', 'bilinear', 'learned-3x3', 'learned-3x3-zeropad',
)

_BILINEAR_KERNEL = jnp.array([
    [0.0625, 0.1250, 0.0625],
    [0.1250, 0.2500, 0.1250],
    [0.0625, 0.1250, 0.0625],
])


def _bilinear_kernel_init(key, shape, dtype=jnp.float32):
    # depthwise kernel shape: (3, 3, 1, C)
    del key
    return jnp.broadcast_to(
        _BILINEAR_KERNEL[:, :, None, None], shape
    ).astype(dtype)


def upsample_nearest_2x(x):
    """Exact x2 nearest upsampling via repeat (NHWC)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def resize_bilinear(x, height: int, width: int):
    """Half-pixel-centered bilinear resize (torch align_corners=False /
    jax.image 'linear')."""
    shape = (*x.shape[:-3], height, width, x.shape[-1])
    return jax.image.resize(x, shape, method='linear')


def resize_nearest(x, height: int, width: int):
    """Nearest resize with the same floor(i*src/dst) index mapping as
    the host preprocessing resize (exact for label maps)."""
    h, w = x.shape[-3], x.shape[-2]
    yi = jnp.clip((jnp.arange(height) * h) // height, 0, h - 1)
    xi = jnp.clip((jnp.arange(width) * w) // width, 0, w - 1)
    return x[..., yi[:, None], xi[None, :], :]


class Upsampling(nn.Module):
    mode: str = 'bilinear'
    n_channels: int = 0
    scale_factor: Union[float, Tuple[float, float]] = 2.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mode = self.mode.lower()
        if mode not in KNOWN_UPSAMPLING_METHODS:
            raise ValueError(f"Unknown upsampling: '{mode}'")

        sf = self.scale_factor
        if isinstance(sf, (tuple, list)):
            sfy, sfx = sf
        else:
            sfy = sfx = sf

        h, w = x.shape[-3], x.shape[-2]
        new_h, new_w = int(h * sfy), int(w * sfx)

        if 'learned-3x3' in mode:
            assert (sfy, sfx) == (2.0, 2.0) or (sfy, sfx) == (2, 2)
            n = self.n_channels or x.shape[-1]
            if mode == 'learned-3x3-zeropad':
                # fused form: nearest x2 + zero-padded depthwise 3x3 is
                # EXACTLY an input-dilated depthwise conv with the 4x4
                # kernel flip(T W T^T), T = [[0,0,1],[0,1,1],[1,1,0],
                # [1,0,0]] -- one op, no 2x-upsampled intermediate
                # (verified bit-wise against the two-op form)
                kernel = self.param('kernel', _bilinear_kernel_init,
                                    (3, 3, 1, n), jnp.float32)
                T = jnp.asarray([[0, 0, 1], [0, 1, 1],
                                 [1, 1, 0], [1, 0, 0]], jnp.float32)
                kt = jnp.einsum('ay,yxzc,bx->abzc', T, kernel, T)
                kt = kt[::-1, ::-1]
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), kt.astype(self.dtype),
                    (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=n)
                if self.use_bias:
                    bias = self.param('bias', nn.initializers.zeros,
                                      (n,), jnp.float32)
                    y = y + bias.astype(self.dtype)
                return y
            # replication-padding variant keeps the two-op form
            x = upsample_nearest_2x(x)
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        mode='edge')
            x = nn.Conv(
                n, (3, 3), padding='VALID', feature_group_count=n,
                use_bias=self.use_bias, dtype=self.dtype,
                kernel_init=_bilinear_kernel_init,
                bias_init=nn.initializers.zeros,
                name='conv',
            )(x)
            return x

        if mode == 'nearest':
            if (sfy, sfx) == (2.0, 2.0) or (sfy, sfx) == (2, 2):
                return upsample_nearest_2x(x)
            return resize_nearest(x, new_h, new_w)

        return resize_bilinear(x, new_h, new_w)


def get_upsampling_name(name: Optional[str] = None) -> str:
    if name is None:
        name = 'bilinear'
    name = name.lower()
    if name not in KNOWN_UPSAMPLING_METHODS:
        raise ValueError(f"Unknown upsampling: '{name}'")
    return name
