"""PrimerEZ encoder/decoder stack parity vs the executed reference.

The reference's ``PrimerEZEncoder``/``PrimerEZDecoder``
(``/root/reference/models/modules/transformer.py:248-347``) are dead code
on every reference path but part of its model-zoo surface.  One set of
weights, both frameworks: the torch modules are instantiated, transplanted
via ``interop.import_primer_stack``, and compared on fixed inputs
(including masked attention).  Reference code is EXECUTED, never copied.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_transformer():
    import os

    if not os.path.isdir(REFERENCE):
        pytest.skip("reference checkout not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from models.modules import transformer as ref_t

    return ref_t


D_X, D_MODEL, HEADS, LAYERS, T, N = 9, 32, 4, 2, 6, 2


def test_primer_encoder_parity(ref_transformer):
    torch.manual_seed(0)
    enc = ref_transformer.PrimerEZEncoder(D_X, D_MODEL, HEADS, 0.0, LAYERS,
                                          d_out=5)
    enc.eval()
    x = torch.randn(T, N, D_X)                  # reference is (T, N, C)
    with torch.no_grad():
        want = enc(x)

    import jax
    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop.torch_import import import_primer_stack
    from gesture_diffusion_tpu.models.primer import PrimerEZEncoder

    params = import_primer_stack(enc.state_dict(), LAYERS, with_src=False)
    net = PrimerEZEncoder(d_x=D_X, d_model=D_MODEL, heads=HEADS,
                          n_layers=LAYERS, d_out=5)
    got = net.apply({"params": params},
                    jnp.asarray(np.moveaxis(x.numpy(), 0, 1)))   # (N, T, C)
    err = np.abs(np.moveaxis(np.asarray(got), 1, 0)
                 - want.numpy()).max()
    assert err < 2e-5, f"max err {err}"


def test_primer_decoder_parity_with_mask(ref_transformer):
    torch.manual_seed(1)
    dec = ref_transformer.PrimerEZDecoder(D_X, D_MODEL, HEADS, 0.0, LAYERS)
    dec.eval()
    x = torch.randn(T, N, D_X)
    t_mem = 5
    memory = torch.randn(t_mem, N, D_MODEL)
    # causal self-attention mask, reference layout [T_q, T_k, N]
    causal = torch.tril(torch.ones(T, T, dtype=torch.bool))
    mask_ref = causal[:, :, None].expand(T, T, N)
    with torch.no_grad():
        want = dec(x, memory, mask=mask_ref)

    import jax.numpy as jnp

    from gesture_diffusion_tpu.interop.torch_import import import_primer_stack
    from gesture_diffusion_tpu.models.primer import PrimerEZDecoder

    params = import_primer_stack(dec.state_dict(), LAYERS, with_src=True)
    net = PrimerEZDecoder(d_x=D_X, d_model=D_MODEL, heads=HEADS,
                          n_layers=LAYERS)
    mask = jnp.asarray(np.tril(np.ones((T, T), bool)))[None, :, :, None]
    got = net.apply({"params": params},
                    jnp.asarray(np.moveaxis(x.numpy(), 0, 1)),
                    jnp.asarray(np.moveaxis(memory.numpy(), 0, 1)),
                    mask=mask)
    err = np.abs(np.moveaxis(np.asarray(got), 1, 0)
                 - want.numpy()).max()
    assert err < 2e-5, f"max err {err}"
