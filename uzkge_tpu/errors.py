"""Structured error types mirroring the reference's `UzkgeError` enum
(`/root/reference/uzkge/src/errors.rs:5-45`).

The reference propagates a single error enum through `Result`; here the
equivalent is an exception hierarchy rooted at `UzkgeError` so callers can
catch the whole family or a specific class.  Verification failures are
returned as booleans (like the reference's `Result<(), VerificationError>`
collapsed at the SDK layer); errors below are for malformed inputs, missing
parameters, and internal invariant violations.
"""


class UzkgeError(Exception):
    """Base class for all framework errors."""


class SerializationError(UzkgeError):
    """Could not serialize object."""


class DeserializationError(UzkgeError):
    """Could not deserialize object."""


class ParameterError(UzkgeError):
    """Unexpected parameter for method or function."""


class MissingVerifierParamsError(UzkgeError):
    """Loading verifier parameters that are not embedded."""


class MissingSRSError(UzkgeError):
    """No SRS available for proof generation."""


class VerifierParamsError(UzkgeError):
    """Could not preprocess verifier."""


class PCSProveEvalError(UzkgeError):
    """Cannot compute the opening proof (sumcheck failed)."""


class DegreeError(UzkgeError):
    """Polynomial degree above the maximum supported by the SRS."""


class SelectorIndexOutOfBound(UzkgeError):
    """Querying a selector that does not exist."""


class ChallengeError(UzkgeError):
    """Invalid Fiat-Shamir challenge."""


class SetupError(UzkgeError):
    """Setup error."""


class GroupNotFound(UzkgeError):
    """No evaluation domain of the requested size."""

    def __init__(self, size: int):
        super().__init__(f"group not found of size {size}")
        self.size = size


class DivisionByZero(UzkgeError):
    """Division by zero in polynomial arithmetic."""


class CommitmentError(UzkgeError):
    """Commitment error."""


class FFTError(UzkgeError):
    """FFT error."""


class FuncParamsError(UzkgeError):
    """Function params error."""


class ProofError(UzkgeError):
    """Malformed or inconsistent proof."""


class VerificationError(UzkgeError):
    """Proof verification failed (only raised where the reference does)."""


class DanglingWitnessError(UzkgeError):
    """A witness variable was allocated but never used in any gate — the
    analogue of the reference `debug` feature's dangling-witness panic
    (turbo/mod.rs:979-1001)."""

    def __init__(self, variables, origins=None):
        self.variables = sorted(variables)
        self.origins = origins or {}
        msg = f"dangling witness variables (allocated, never constrained): {self.variables[:16]}"
        if len(self.variables) > 16:
            msg += f" ... ({len(self.variables)} total)"
        for v in self.variables[:4]:
            if v in self.origins:
                msg += f"\n  var {v} allocated at:\n{self.origins[v]}"
        super().__init__(msg)
