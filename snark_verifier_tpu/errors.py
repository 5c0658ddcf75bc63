"""Verification error model (reference parity: the 4-variant `Error` enum at
/root/reference/snark-verifier/src/lib.rs:18-30)."""

from __future__ import annotations


class Error(Exception):
    """Base class for verification errors."""


class InvalidInstances(Error):
    """Instances don't match the amount specified in the protocol."""


class InvalidProtocol(Error):
    """Protocol that is unreasonable for a verifier."""


class AssertionFailure(Error):
    """Assertion failure during verification."""


class TranscriptError(Error):
    """Transcript (de)serialization failure."""
