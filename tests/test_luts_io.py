"""JSON store roundtrip + numerical parity against the reference's shipped
coefficient files (same LUT algebra up to its known x256 XOR scaling,
SURVEY.md quirk Q2)."""

import json
from pathlib import Path

import numpy as np
import pytest

from aes_fhe_tpu.aes import luts, luts_io

pytestmark = pytest.mark.fast

REF_COEFF = Path("/root/reference/gen/coeff")


def test_roundtrip(tmp_path):
    files = luts_io.write_all_coeff_files(tmp_path)
    # xor4 + 7 gf-mults x2 + sbox/inv-sbox hi+lo + lift16 + zeta16-snap
    assert len(files) == 1 + 14 + 4 + 1 + 1
    back = luts_io.load_coeff2d(tmp_path / "xor4_coeffs.json", (16, 16))
    np.testing.assert_allclose(back, luts.xor4_coeffs(), atol=1e-12)
    hi = luts_io.load_coeff1d(tmp_path / "mod256_to_16_hi_coeffs.json", 256)
    np.testing.assert_allclose(hi, luts.sbox_coeffs(False)[0], atol=1e-12)


@pytest.mark.skipif(not REF_COEFF.exists(), reason="reference not mounted")
def test_parity_with_reference_gf_mult():
    for k in (2, 3, 9, 11, 13, 14):
        ours_hi, ours_lo = luts.gf_mult_coeffs(k)
        for which, ours in (("hi", ours_hi), ("lo", ours_lo)):
            ref = luts_io.load_coeff2d(
                REF_COEFF / f"gf_mult{k}_{which}_coeffs.json", (16, 16)
            )
            np.testing.assert_allclose(
                ours, ref, atol=1e-9, err_msg=f"gf_mult{k}_{which}"
            )


@pytest.mark.skipif(not REF_COEFF.exists(), reason="reference not mounted")
def test_parity_with_reference_xor4_up_to_q2_scaling():
    """The reference XOR set is x256 (ifft2 * n^2, its quirk Q2); ours is
    unit-normalized.  They must agree after removing that factor."""
    ref = luts_io.load_coeff2d(REF_COEFF / "xor4_coeffs.json", (16, 16))
    np.testing.assert_allclose(luts.xor4_coeffs() * 256.0, ref, atol=1e-6)


@pytest.mark.skipif(not REF_COEFF.exists(), reason="reference not mounted")
def test_parity_with_reference_sbox():
    for tag, inv in (("", False), ("inv_", True)):
        ours_hi, ours_lo = luts.sbox_coeffs(inv)
        for which, ours in (("hi", ours_hi), ("lo", ours_lo)):
            ref = luts_io.load_coeff1d(
                REF_COEFF / f"{tag}mod256_to_16_{which}.json", 256
            )
            np.testing.assert_allclose(
                ours, ref, atol=1e-9, err_msg=f"{tag}{which}"
            )