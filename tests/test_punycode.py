"""RFC 3492 punycode codec (kernels/punycode.py): RFC sample vectors,
stdlib-idna parity sweep, round-trips, error paths, hypothesis."""

import pytest
from hypothesis import given
from hypothesis import strategies as st

from paddleocr_spark.kernels.punycode import (
    host_to_ascii,
    host_to_unicode,
    punycode_decode,
    punycode_encode,
)

# RFC 3492 §7.1 sample strings (subset; case-insensitive bodies)
RFC_CASES = {
    "ليهمابتكلموشعربي؟": "egbpdaj6bu4bxfgehfvwxn",
    "他们为什么不说中文": "ihqwcrb4cv8a8dqg056pqjye",
    "пример": "e1afmkfd",
    "3年b組金八先生": "3b-ww4c5e180e575a65lsy2b",
    "maji de koi suru 5 byou mae": "maji de koi suru 5 byou mae-",
}


@pytest.mark.parametrize("uni,puny", RFC_CASES.items())
def test_rfc_sample_vectors(uni, puny):
    uni = uni.lower()
    assert punycode_encode(uni).lower() == puny.lower()
    assert punycode_decode(puny) == uni


def test_stdlib_parity_sweep():
    labels = [
        f"src{i}" for i in range(20)
    ] + [
        "münchen", "bücher", "пример", "ѕrc0", "srс10", "ѕrс7",
        "café", "ελληνικά", "中文测试", "مثال",
        "a1-b2", "ѕсѕс",
    ]
    for lab in labels:
        assert host_to_ascii(lab) == lab.encode("idna").decode()
        assert host_to_unicode(host_to_ascii(lab)) == lab.lower()


def test_multilabel_hosts():
    assert host_to_ascii("bücher.example.test") == (
        "xn--bcher-kva.example.test"
    )
    assert host_to_unicode("xn--bcher-kva.example.test") == (
        "bücher.example.test"
    )


def test_decode_error_paths():
    with pytest.raises(ValueError, match="truncated"):
        punycode_decode("a-9")  # digit 9 demands a continuation
    with pytest.raises(ValueError, match="digit"):
        punycode_decode("abc-!!")
    with pytest.raises(ValueError, match="non-basic"):
        punycode_decode("münchen-abc")


@given(
    st.text(
        alphabet=st.characters(
            min_codepoint=ord("a"),
            max_codepoint=0x3FF,
            blacklist_categories=("Cs", "Cc"),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_roundtrip_property(label):
    # encode/decode are exact inverses for any label our encoder accepts
    body = punycode_encode(label)
    assert punycode_decode(body) == label
