import json

from vision_compression_project_tpu.utils import (
    retry,
    safe_json_loads,
    strip_code_fences,
)


def test_strip_code_fences_json():
    s = '```json\n{"a": 1}\n```'
    assert strip_code_fences(s) == '{"a": 1}'


def test_strip_code_fences_plain():
    assert strip_code_fences('{"a": 1}') == '{"a": 1}'
    assert strip_code_fences("```\nhello\n```") == "hello"


def test_safe_json_loads_fenced():
    assert safe_json_loads('```json\n{"x": [1, 2]}\n```') == {"x": [1, 2]}


def test_safe_json_loads_salvage():
    assert safe_json_loads('noise before {"k": "v"} after') == {"k": "v"}


def test_safe_json_loads_failure():
    assert safe_json_loads("not json at all") is None
    assert safe_json_loads(None) is None


def test_safe_json_loads_legacy_page_shape():
    # Legacy artifact shape: fenced JSON inside a raw_response string
    # (both shapes present in the reference's checked-in output/).
    inner = {"page_number": 3, "markdown": "# T", "entities": [], "summary": "s"}
    raw = "```json\n" + json.dumps(inner) + "\n```"
    assert safe_json_loads(raw) == inner


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")
        return "ok"

    assert retry(flaky, attempts=3, sleep=lambda _: None) == "ok"
    assert calls["n"] == 3


def test_retry_exhausts():
    def always_fails():
        raise ValueError("nope")

    try:
        retry(always_fails, attempts=2, sleep=lambda _: None)
        assert False, "should have raised"
    except ValueError:
        pass


def test_repair_truncated_json():
    from vision_compression_project_tpu.utils.json_utils import (
        repair_truncated_json,
    )

    # Cut mid string value.
    assert repair_truncated_json('{"markdown": "# Title\\n\\nBody tex') == {
        "markdown": "# Title\n\nBody tex"
    }
    # Cut mid escape sequence.
    assert repair_truncated_json('{"a": "x\\') == {"a": "x"}
    # Cut after a comma / after a colon.
    assert repair_truncated_json('{"a": 1,') == {"a": 1}
    assert repair_truncated_json('{"a":') == {"a": None}
    # Nested structures.
    assert repair_truncated_json('{"a": [1, 2, {"b": "c') == {
        "a": [1, 2, {"b": "c"}]
    }
    # Complete JSON is not this function's job.
    assert repair_truncated_json('{"a": 1}') is None


def test_safe_json_loads_truncated_fenced():
    """The golden-fixture case: fenced JSON cut off mid-markdown recovers
    the markdown text instead of failing to None."""
    raw = '```json\n{\n  "page_number": 1,\n  "markdown": "# Doc\\n\\nSome tex'
    out = safe_json_loads(raw)
    assert out == {"page_number": 1, "markdown": "# Doc\n\nSome tex"}
