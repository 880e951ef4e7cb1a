from __future__ import annotations

from hypothesis import given
from hypothesis import strategies as st

from automated_datastore_discovery_with_aws_glue_spark.functions.sanitize import sanitize_identifier


@given(st.text(min_size=0, max_size=64))
def test_sanitize_idempotent(s):
    once = sanitize_identifier(s)
    assert sanitize_identifier(once) == once


@given(st.text(min_size=1, max_size=64))
def test_sanitize_output_valid(s):
    out = sanitize_identifier(s)
    assert out
    assert not out[0].isdigit()
    assert all(c.isalnum() or c == "_" for c in out)
    assert out == out.lower()


def test_reference_examples():
    # lambda/catalog-creator-s3/app.py:246-249 behavior
    assert sanitize_identifier("my-bucket.name") == "my_bucket_name"
    assert sanitize_identifier("MyTable") == "mytable"
