"""AES-256-GCM encrypted-payload family (crypto.py + oracle dispatch).

Mirrors SRC/encryption/impl/AesEncryptionServiceImpl.java:53-112 and the
upload gate at SRC/documents/impl/DocumentUploadImpl.java:55-63: AES/GCM/
NoPadding, 256-bit key, 12-byte IV, 128-bit tag, ct||tag layout, IV
stored base64.  Ciphertexts must be byte-deterministic (fixture key +
conv/turn-derived IV) so the DuckDB VALUES oracle stays exact.
"""

import base64
import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from unraveldocs_spark import crypto
from unraveldocs_spark.oracle import (
    RULE_ERROR_DECRYPT,
    RULE_HTML,
    RULE_TOOL_FENCE,
    extract_turn,
)

pytestmark = pytest.mark.skipif(
    not crypto.HAVE_AESGCM, reason="cryptography not installed"
)


class TestPrimitives:
    def test_ciphertext_is_deterministic_and_pinned(self):
        # Pin the exact bytes: any change to key derivation, IV
        # derivation, or cipher parameters breaks the fixture corpus.
        ct = crypto.encrypt_bytes(
            crypto.FIXTURE_MASTER_KEY, crypto.derive_iv("conv-000001", 3), b"hello"
        )
        assert ct.hex() == "d3cb707a8d0af23816fef84d52bec98e564e967343"
        assert ct == crypto.encrypt_bytes(
            crypto.FIXTURE_MASTER_KEY, crypto.derive_iv("conv-000001", 3), b"hello"
        )

    def test_java_layout_ct_then_tag(self):
        # Java's doFinal appends the 128-bit tag: len == |pt| + 16
        pt = b"x" * 37
        iv = crypto.derive_iv("c", 0)
        ct = crypto.encrypt_bytes(crypto.FIXTURE_MASTER_KEY, iv, pt)
        assert len(ct) == len(pt) + crypto.TAG_BITS // 8
        assert crypto.decrypt_bytes(crypto.FIXTURE_MASTER_KEY, iv, ct) == pt

    def test_iv_is_12_bytes_and_per_turn_unique(self):
        ivs = {crypto.derive_iv("conv-0", t) for t in range(100)}
        assert len(ivs) == 100
        assert all(len(iv) == crypto.IV_LEN for iv in ivs)

    @settings(max_examples=50, deadline=None)
    @given(st.text(max_size=500), st.integers(0, 1000))
    def test_envelope_roundtrip(self, text, turn_idx):
        env = crypto.encrypted_envelope("conv-p", turn_idx, text)
        obj = json.loads(env)
        assert obj["kind"] == "encrypted"
        assert crypto.decrypt_envelope_fields(obj["iv"], obj["data"]) == text

    def test_tampered_ciphertext_raises_reference_message(self):
        env = json.loads(crypto.encrypted_envelope("conv-t", 0, "secret"))
        ct = bytearray(base64.b64decode(env["data"]))
        ct[0] ^= 0xFF
        with pytest.raises(ValueError, match=crypto.ERR_DECRYPT):
            crypto.decrypt_envelope_fields(
                env["iv"], base64.b64encode(bytes(ct)).decode()
            )

    def test_wrong_iv_raises(self):
        env = json.loads(crypto.encrypted_envelope("conv-t", 0, "secret"))
        bad_iv = base64.b64encode(crypto.derive_iv("conv-t", 1)).decode()
        with pytest.raises(ValueError, match=crypto.ERR_DECRYPT):
            crypto.decrypt_envelope_fields(bad_iv, env["data"])


class TestDispatch:
    def test_decrypt_then_extract_html(self):
        html = "<html><body><p>alpha beta</p></body></html>"
        env = crypto.encrypted_envelope("c", 0, html)
        r = extract_turn("user", None, env)
        r_plain = extract_turn("user", None, html)
        assert r.rule == RULE_HTML
        assert r.status == "COMPLETED"
        assert r.extracted_text == r_plain.extracted_text

    def test_decrypt_precedes_tool_fence(self):
        # The reference decrypts stored bytes BEFORE any OCR routing, so
        # an encrypted tool turn must decrypt first, then fence-strip the
        # PLAINTEXT — not fence-strip the envelope JSON.
        payload = "```json\n{\"a\": 1}\n```"
        env = crypto.encrypted_envelope("c", 1, payload)
        r = extract_turn("tool", "bash", env)
        r_plain = extract_turn("tool", "bash", payload)
        assert r.rule == RULE_TOOL_FENCE
        assert r.extracted_text == r_plain.extracted_text

    def test_tamper_becomes_row_level_failed(self):
        env = json.loads(crypto.encrypted_envelope("c", 2, "text"))
        env["data"] = "AAAA" + env["data"][4:]
        r = extract_turn("user", None, json.dumps(env))
        assert r.status == "FAILED"
        assert r.rule == RULE_ERROR_DECRYPT
        assert crypto.ERR_DECRYPT in r.error_message

    def test_missing_fields_fail(self):
        r = extract_turn("user", None, '{"kind":"encrypted"}')
        assert r.status == "FAILED"
        assert r.rule == RULE_ERROR_DECRYPT

    def test_should_encrypt_skips_null_and_is_deterministic(self):
        assert not crypto.should_encrypt("c", 0, None)
        draws = [crypto.should_encrypt("conv-x", t, "p") for t in range(200)]
        assert draws == [crypto.should_encrypt("conv-x", t, "p") for t in range(200)]
        rate = sum(draws) / len(draws)
        assert 0.4 < rate < 0.8  # ~ENC_RATE_PCT


class TestSparkStage:
    def test_encrypt_stage_matches_python_and_extraction_roundtrips(self, spark):
        from unraveldocs_spark.extract import encrypt_stage, extract_stage
        from unraveldocs_spark.generator import transcripts_spark

        t = transcripts_spark(spark, 4, hot_factor=2, include_oversize=False)
        enc = encrypt_stage(t).orderBy("conv_id", "turn_idx").collect()
        assert any(r.is_encrypted == 1 for r in enc)
        assert any(r.is_encrypted == 0 for r in enc)
        for r in enc:
            text_plain = None
            # re-derive the plaintext from the pure generator
            from unraveldocs_spark.generator import make_turn

            c = int(r.conv_id.split("-")[1])
            _, text_plain, _ = make_turn(c, r.turn_idx, include_oversize=False)
            out, flag, iv = crypto.encrypt_turn(r.conv_id, r.turn_idx, text_plain)
            assert (r.text, r.is_encrypted, r.iv_b64) == (out, flag, iv)
        # and the distributed extraction of the encrypted frame equals
        # the plaintext extraction per turn (the north-rule equality)
        enc_x = {
            (r.conv_id, r.turn_idx): (r.status, r.rule, r.extracted_text)
            for r in extract_stage(encrypt_stage(t)).collect()
        }
        plain_x = {
            (r.conv_id, r.turn_idx): (r.status, r.rule, r.extracted_text)
            for r in extract_stage(t).collect()
        }
        assert enc_x == plain_x
