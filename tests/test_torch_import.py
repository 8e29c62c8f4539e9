"""Reference-checkpoint migration: torch ``vae.state_dict()`` -> our params.

The reference saves ``torch.save(vae.state_dict(), path)`` (<ref>text.py,
SURVEY.md §5 checkpoint row). `utils/torch_import.py` converts such a file
into this framework's pytree; these tests build reference-shaped
state_dicts (the key names the reference's module tree would produce) from
known JAX params, round-trip them through real ``torch.save`` files in both
torch serialization formats, and require EXACT parameter recovery plus
identical model math. Structural robustness (shape-based role assignment,
name-hint tie-breaks at degenerate dims, bias / conv / multi-layer
rejections) is covered separately.
"""
from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from vae_lagging_encoder_tpu.models import VAE, GaussianLSTMEncoder, LSTMDecoder
from vae_lagging_encoder_tpu.train.checkpoint import (load_checkpoint,
                                                      save_checkpoint)
from vae_lagging_encoder_tpu.utils.torch_import import (
    import_torch_state_dict, load_torch_checkpoint, main as import_main)

V, NI, ENC_NH, DEC_NH, NZ = 97, 12, 16, 20, 3


def _make_params(seed=0, ni=NI, enc_nh=ENC_NH, dec_nh=DEC_NH, nz=NZ):
    enc = GaussianLSTMEncoder(V, ni, enc_nh, nz)
    dec = LSTMDecoder(V, ni, dec_nh, nz, dropout_in=0.5, dropout_out=0.5)
    vae = VAE(enc, dec)
    return vae, vae.init(jax.random.PRNGKey(seed))


def _reference_state_dict(params, enc_names=None, dec_names=None):
    """Build the state_dict the reference's module tree would save, by
    inverting the layout conversions (tests/torch_replica.py boundary)."""
    t = lambda a: torch.from_numpy(np.asarray(a).copy())
    e, d = params["enc"], params["dec"]
    en = enc_names or {"emb": "embed.weight", "linear": "linear.weight"}
    dn = dec_names or {"emb": "embed.weight", "trans": "trans_linear.weight",
                       "pred": "pred_linear.weight"}
    sd = {}
    for side, p, names in (("encoder", e, en), ("decoder", d, dn)):
        sd[f"{side}.{names['emb']}"] = t(p["emb"])
        sd[f"{side}.lstm.weight_ih_l0"] = t(p["lstm"]["wx"].T)
        sd[f"{side}.lstm.weight_hh_l0"] = t(p["lstm"]["wh"].T)
        sd[f"{side}.lstm.bias_ih_l0"] = t(p["lstm"]["b_ih"])
        sd[f"{side}.lstm.bias_hh_l0"] = t(p["lstm"]["b_hh"])
    sd[f"encoder.{en['linear']}"] = t(e["linear"].T)
    sd[f"decoder.{dn['trans']}"] = t(d["trans"].T)
    sd[f"decoder.{dn['pred']}"] = t(d["pred"].T)
    return sd


def _assert_tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(lb[path]), err_msg=str(path))


def test_roundtrip_exact_and_same_math():
    vae, params = _make_params()
    got = import_torch_state_dict(_reference_state_dict(params))
    _assert_tree_equal(params, got)

    # identical math through the real model, not just identical arrays
    rng = np.random.RandomState(0)
    tokens = jnp.asarray(rng.randint(0, V, size=(4, 9)), dtype=jnp.int32)
    mask = jnp.ones((4, 9), jnp.float32)
    key = jax.random.PRNGKey(5)
    a = vae.loss(params, key, tokens, mask, kl_weight=0.9, train=False)
    b = vae.loss(got, key, tokens, mask, kl_weight=0.9, train=False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("legacy_format", [False, True])
def test_torch_save_file_autodetected(tmp_path, legacy_format):
    """A real torch.save file (both serialization formats) loads through
    the ordinary load_checkpoint --load_path route."""
    _, params = _make_params(seed=1)
    pt = str(tmp_path / "model.pt")
    torch.save(_reference_state_dict(params), pt,
               _use_new_zipfile_serialization=not legacy_format)
    got, extra = load_checkpoint(pt)
    _assert_tree_equal(params, got)
    assert extra["format"] == "torch_state_dict"


def test_cli_converts_to_npz(tmp_path, capsys):
    _, params = _make_params(seed=2)
    pt, out = str(tmp_path / "ref.pt"), str(tmp_path / "model.ckpt")
    torch.save(_reference_state_dict(params), pt)
    assert import_main([pt, out]) == 0
    assert f"V={V}" in capsys.readouterr().out
    got, extra = load_checkpoint(out)
    _assert_tree_equal(params, got)
    assert extra["imported_from"] == pt


def test_name_drift_tolerated():
    """Role assignment is structural: plausible alternative attribute names
    (the exact reference names are [MED] while the mount is empty) must
    still import, including at degenerate dims ni == dec_nh where the
    pred/embedding shapes collide and hints break the tie."""
    _, params = _make_params(seed=3, ni=10, dec_nh=10)
    sd = _reference_state_dict(
        params,
        enc_names={"emb": "emb.weight", "linear": "mu_logvar.weight"},
        dec_names={"emb": "word_emb.weight", "trans": "z2h.trans.weight",
                   "pred": "output_linear.weight"})
    got = import_torch_state_dict(sd)
    _assert_tree_equal(params, got)


def test_zero_bias_dropped_nonzero_rejected():
    _, params = _make_params(seed=4)
    sd = _reference_state_dict(params)
    sd["decoder.trans_linear.bias"] = torch.zeros(DEC_NH)
    _assert_tree_equal(params, import_torch_state_dict(sd))

    sd["decoder.trans_linear.bias"] = torch.full((DEC_NH,), 0.5)
    with pytest.raises(ValueError, match="bias-free"):
        import_torch_state_dict(sd)


def test_export_roundtrip_and_cli(tmp_path, capsys):
    """Export (ours -> reference-style state_dict) inverts the import
    exactly, and the CLI infers the export direction from a native input."""
    from vae_lagging_encoder_tpu.utils.torch_import import \
        export_torch_state_dict

    _, params = _make_params(seed=6)
    sd = export_torch_state_dict(params)
    assert set(sd) == set(_reference_state_dict(params))
    _assert_tree_equal(params, import_torch_state_dict(sd))

    ck, pt = str(tmp_path / "model.ckpt"), str(tmp_path / "back.pt")
    save_checkpoint(ck, params, {})
    assert import_main([ck, pt]) == 0
    assert "exported" in capsys.readouterr().out
    got = torch.load(pt, weights_only=True)
    for k, v in sd.items():
        assert torch.equal(got[k], v), k

    # full cycle: import the export, then export the IMPORT-PRODUCED npz —
    # direction must key on file format, not on the npz's persisted
    # 'torch_state_dict' extras tag (code-review r3)
    ck2, pt2 = str(tmp_path / "model2.ckpt"), str(tmp_path / "back2.pt")
    assert import_main([pt, ck2]) == 0
    assert "imported" in capsys.readouterr().out
    assert import_main([ck2, pt2]) == 0
    assert "exported" in capsys.readouterr().out
    got2 = torch.load(pt2, weights_only=True)  # a real torch file again
    for k, v in sd.items():
        assert torch.equal(got2[k], v), k


def test_image_and_multilayer_rejected(tmp_path):
    _, params = _make_params(seed=5)
    sd = _reference_state_dict(params)
    sd["decoder.conv.weight"] = torch.zeros(4, 4, 3, 3)
    with pytest.raises(NotImplementedError, match="OmniGlot"):
        import_torch_state_dict(sd)

    sd = _reference_state_dict(params)
    sd["encoder.lstm.weight_ih_l1"] = sd["encoder.lstm.weight_ih_l0"]
    with pytest.raises(ValueError, match="multi-layer"):
        import_torch_state_dict(sd)

    with pytest.raises(ValueError, match="encoder"):
        import_torch_state_dict({"decoder.x": torch.zeros(2, 2)})


def test_unrecognized_1d_params_rejected():
    """A leftover 1-D parameter (e.g. a LayerNorm) must fail loudly, not
    be silently dropped into a lossy import; all-zero stray biases are the
    one tolerated leftover."""
    _, params = _make_params(seed=7)
    sd = _reference_state_dict(params)
    sd["encoder.norm.weight"] = torch.ones(ENC_NH)
    with pytest.raises(ValueError, match="unrecognized"):
        import_torch_state_dict(sd)

    sd = _reference_state_dict(params)
    sd["encoder.stray.bias"] = torch.zeros(ENC_NH)   # zero bias: tolerated
    _assert_tree_equal(params, import_torch_state_dict(sd))


def test_export_rejects_image_pytree():
    from vae_lagging_encoder_tpu.utils.torch_import import \
        export_torch_state_dict

    with pytest.raises(NotImplementedError, match="text-family"):
        export_torch_state_dict({"enc": {"conv": np.zeros((3, 3, 1, 4))},
                                 "dec": {}})
