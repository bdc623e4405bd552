"""Engine exceptions, same error surface as the reference.

Reference: xetra/common/custom_exceptions.py:1-19 — ``WrongFormatException``
(unsupported sink format) and ``WrongMetaFileException`` (meta-table schema
drift). Kept with identical names so reference users can migrate except
clauses unchanged.
"""

from __future__ import annotations


class WrongFormatException(Exception):
    """Raised when an unsupported sink/source format is requested.

    Reference: xetra/common/s3.py:104-107 raises this from the write
    dispatcher when format is not in {csv, parquet}.
    """


class WrongMetaFileException(Exception):
    """Raised when the incremental meta table's columns do not match.

    Reference: xetra/common/meta_process.py:44-50 compares the column
    multiset of the existing meta file against the expected schema.
    """
