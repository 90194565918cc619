"""Grammar-parity sweep: every PRQL snippet in the reference's book
test corpus (/root/reference/book/tests/prql/**) must parse.

Execution parity for the queries whose tables exist in our catalog
is covered by the driver entries and test_invoice_totals; this sweep
pins the *surface area* — if the hand-written parser regresses on
any construct the reference documents, this fails with the file name.
"""

from __future__ import annotations

import glob

import pytest

from prql_spark.parser import parse

BOOK = sorted(
    glob.glob("/root/reference/book/tests/prql/**/*.prql", recursive=True)
)


def test_corpus_present():
    assert len(BOOK) >= 80


@pytest.mark.parametrize(
    "path", BOOK, ids=[p.rsplit("prql/", 1)[-1] for p in BOOK]
)
def test_book_snippet_parses(path):
    parse(open(path).read())
