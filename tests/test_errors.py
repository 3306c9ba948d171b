"""The structured error hierarchy is wired at real failure sites
(errors.py <-> reference uzkge/src/errors.rs:5-45)."""

import pytest

from uzkge_tpu import errors


def test_deserialization_errors():
    from uzkge_tpu.utils import serialize as ser

    with pytest.raises(errors.DeserializationError):
        ser.g1_from_uncompress_be(b"\x01" * 63)
    with pytest.raises(errors.DeserializationError):
        ser.g1_from_uncompress_be(b"\x01" * 64)  # not on curve
    with pytest.raises(errors.DeserializationError):
        ser.ark_fr_read(b"\xff" * 32)  # non-canonical
    with pytest.raises(errors.DeserializationError):
        ser.BincodeReader(b"\x01").take(5)


def test_missing_srs_and_vk():
    from uzkge_tpu.gen_params import load_shuffle_verifier_params
    from uzkge_tpu.utils.serialize import load_srs_params

    with pytest.raises(errors.MissingSRSError):
        load_srs_params(32768, b"\x00" * 8)
    with pytest.raises(errors.MissingVerifierParamsError):
        load_shuffle_verifier_params(13)


def test_degree_error():
    from uzkge_tpu.pcs.kzg import KZG

    kzg = KZG.setup_insecure(4, tau=7)
    with pytest.raises(errors.DegreeError):
        kzg.commit_coefs([1] * 10)


def test_group_not_found():
    from uzkge_tpu.ntt.ntt import get_domain

    with pytest.raises(errors.GroupNotFound):
        get_domain(12)
    with pytest.raises(errors.GroupNotFound):
        get_domain(1 << 40)  # beyond Fr two-adicity... (2-adicity is 28)


def test_proof_error():
    from uzkge_tpu.plonk.proof_io import proof_from_bytes_be

    with pytest.raises(errors.ProofError):
        proof_from_bytes_be(b"\x00" * 100)


def test_parameter_error():
    from uzkge_tpu.msm.fixed_base import FixedBaseTable

    with pytest.raises(errors.ParameterError):
        FixedBaseTable([(1, 2)] * 32, c=5)
