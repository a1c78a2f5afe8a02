from coco_search_ray.functions.tokenize import (
    enrich_text_tokens,
    has_identifier_pattern,
    normalize_query_tokens,
    split_code_identifier,
)


def test_split_camel():
    assert split_code_identifier("getUserById") == ["getUserById", "get", "User", "By", "Id"]


def test_split_snake_keeps_original_first():
    toks = split_code_identifier("get_user_by_id")
    assert toks[0] == "get_user_by_id"
    assert {"get", "user", "by", "id"} <= set(toks)


def test_split_kebab():
    toks = split_code_identifier("foo-bar")
    assert toks[0] == "foo-bar" and "foo" in toks and "bar" in toks


def test_split_plain_word_unchanged():
    assert split_code_identifier("hello") == ["hello"]


def test_identifier_detection():
    assert has_identifier_pattern("getUserById")
    assert has_identifier_pattern("get_user_by_id")
    assert has_identifier_pattern("find getUserById function")
    assert not has_identifier_pattern("find database connection")
    assert not has_identifier_pattern("How do I publish to PyPi?")
    assert not has_identifier_pattern("HTTP API")


def test_query_normalization_preserves_original():
    toks = normalize_query_tokens("find get_user_by_id function")
    assert toks[0] == "find"
    assert "get_user_by_id" in toks
    assert {"get", "user", "by", "id"} <= set(toks)
    assert toks[-1] == "function"


def test_enrich_includes_split_and_lower_words():
    toks = enrich_text_tokens("call PaymentService now")
    assert "PaymentService" in toks
    assert "Payment" in toks and "Service" in toks
    assert "paymentservice" in toks  # raw lowercased word pass
