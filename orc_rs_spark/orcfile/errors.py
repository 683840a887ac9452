"""Typed error surface for the ORC wire layer — the Python analogue of
the reference's OrcError enum (/root/reference/src/lib.rs:25-66).

Every class also subclasses ValueError so existing ``except ValueError``
callers (and tests written against the untyped errors) keep working; new
callers can catch precisely:

- OrcFormatError       <-> CorruptedProtobuf / InvalidTail / UnexpectedEof /
                           MalformedStream / MalformedRleBlock
- OrcUnsupportedError  <-> UnsupportedFeature / TypeNotSupported /
                           UnsupportedDecimalType (encrypted files, lzo, ...)
- OrcBoundsError       <-> InvalidStripeIndex
"""

from __future__ import annotations


class OrcError(ValueError):
    """Base for all ORC wire-layer errors."""


class OrcFormatError(OrcError):
    """The bytes do not form a valid ORC structure (corrupt or truncated)."""


class OrcUnsupportedError(OrcError):
    """Valid ORC, but a feature this reader/writer does not support."""


class OrcBoundsError(OrcError, IndexError):
    """A stripe/row-group index outside the file's range."""
