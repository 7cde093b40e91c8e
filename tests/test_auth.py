"""User registry + token auth tests (reference utils/auth.clj surface)."""

import datetime as dt

from dataworks_spark.registry.auth import (
    UserRegistry,
    create_token,
    hash_password,
    verify_password,
    verify_token,
)
from dataworks_spark.registry.validation import Invalid

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_password_hashing_roundtrip():
    h = hash_password("hunter2")
    assert verify_password("hunter2", h)
    assert not verify_password("hunter3", h)
    assert h != hash_password("hunter2")  # fresh salt per hash


def test_token_sign_verify_expiry():
    tok = create_token({"user": "ada", "roles": ["admin"]}, "s3cret", ttl_s=60, now=T0)
    claims = verify_token(tok, "s3cret", now=T0 + dt.timedelta(seconds=30))
    assert claims["user"] == "ada" and claims["roles"] == ["admin"]
    assert verify_token(tok, "wrong", now=T0) is None  # bad secret
    assert verify_token(tok, "s3cret", now=T0 + dt.timedelta(minutes=2)) is None  # expired
    assert verify_token(tok + "x", "s3cret", now=T0) is None  # tampered


def test_user_registry_lifecycle(spark):
    """add-user → duplicate rejected → login → role authorization
    (auth.clj:11-100) over the bitemporal user store."""
    clock = {"now": T0}
    reg = UserRegistry(spark, secret="s3cret", now_fn=lambda: clock["now"])
    ok = reg.add_user("ada", "hunter2", roles=("admin", "user"))
    assert not isinstance(ok, Invalid)
    assert isinstance(reg.add_user("ada", "other"), Invalid)  # duplicate
    assert isinstance(reg.add_user("bad name!", "x"), Invalid)  # invalid name

    row = reg.get_user("ada")
    assert row is not None and row.user_name == "ada"
    assert reg.check_cred("ada", "wrong") is None
    tok = reg.check_cred("ada", "hunter2")
    assert tok is not None
    assert reg.authorize(tok, ("admin",))
    assert not reg.authorize(tok, ("superroot",))
    # token from another secret is rejected
    other = create_token({"user": "ada", "roles": ["admin"]}, "other", now=T0)
    assert not reg.authorize(other, ("admin",))


def test_token_expiry_is_true_epoch_utc():
    """r9 review: naive utcnow().timestamp() is interpreted as LOCAL
    time — exp skewed by the host's UTC offset, breaking cross-host
    verification. The claim must be a true epoch."""
    import datetime as dt
    import time

    from dataworks_spark.registry.auth import create_token, verify_token

    tok = create_token({"sub": "u"}, "s", ttl_s=3600)
    claims = verify_token(tok, "s")
    assert claims is not None
    # true epoch: within a minute of time.time() + ttl, regardless of TZ
    assert abs(claims["exp"] - (time.time() + 3600)) < 60
    # a verifier passing naive utc 'now' agrees with an aware one
    aware = dt.datetime.now(dt.timezone.utc)
    naive_utc = aware.replace(tzinfo=None)
    assert verify_token(tok, "s", now=aware) is not None
    assert verify_token(tok, "s", now=naive_utc) is not None


def test_password_hash_embeds_iterations_with_legacy_fallback():
    import hashlib

    from dataworks_spark.registry.auth import (
        _PBKDF2_LEGACY_ITERS,
        hash_password,
        verify_password,
    )

    h = hash_password("pw")
    assert h.split("$")[1] == "600000"  # cost embedded -> raisable later
    assert verify_password("pw", h) and not verify_password("no", h)
    # legacy 3-field hashes verify at their original cost
    salt = b"0123456789abcdef"
    legacy_digest = hashlib.pbkdf2_hmac(
        "sha256", b"pw", salt, _PBKDF2_LEGACY_ITERS
    ).hex()
    legacy = f"pbkdf2${salt.hex()}${legacy_digest}"
    assert verify_password("pw", legacy)
