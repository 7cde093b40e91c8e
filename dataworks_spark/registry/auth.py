"""User registry + token auth (reference ``utils/auth.clj``).

The reference stores user documents in Crux and authenticates REST
requests with signed tokens:

  add-user      auth.clj:59-69   — user doc {user-name, hashed pass,
                                   email, roles, display-name}
  new-user      auth.clj:90-100  — registration, rejecting duplicates
  get-user      auth.clj:56-58   — entity point lookup (B8)
  check-cred    auth.clj:70-76   — password verify → token
  create-token  auth.clj:11-19   — signed claims {user-name, roles}
  token-verify  auth.clj:20-27   — signature + expiry check
  get-roles /   auth.clj:28-55   — role-based authorization
  make-authorize

Spark mapping: user docs live in a :class:`DocumentStore` (id =
``user/<name>``), so registration/lookup ride the same bitemporal
put/latest machinery as every other document. Crypto is deliberately
stdlib-only (no new deps): the reference's buddy-hashers bcrypt becomes
salted PBKDF2-HMAC-SHA256, and its buddy-sign JWT becomes an
HMAC-SHA256-signed compact token (``b64(claims).b64(sig)`` — the JWS
HS256 shape). Both constructions are public/standard.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import json
import os

from pyspark.sql import SparkSession

from dataworks_spark.docs.store import DocumentStore, StoreRef
from dataworks_spark.registry.validation import Invalid

_USER_SCHEMA = (
    "id string, user_name string, pass_hash string, email string, "
    "roles string, display_name string, valid_from timestamp, "
    "valid_to timestamp, tx_from timestamp, tx_to timestamp, deleted boolean"
)

# 600k per current OWASP password-storage guidance for
# PBKDF2-HMAC-SHA256 (r9 review; 100k was ~6x under the recommended
# work factor for the bcrypt-replacement role this plays). New hashes
# embed their iteration count (pbkdf2$<iters>$<salt>$<digest>) so the
# cost can be raised again without breaking stored credentials; the
# legacy 3-field format verifies at its original 100k.
_PBKDF2_ITERS = 600_000
_PBKDF2_LEGACY_ITERS = 100_000


def hash_password(password: str, salt: bytes | None = None) -> str:
    """Salted PBKDF2-HMAC-SHA256 (the stdlib stand-in for the
    reference's bcrypt hasher, auth.clj:62)."""
    salt = salt or os.urandom(16)
    digest = hashlib.pbkdf2_hmac("sha256", password.encode(), salt, _PBKDF2_ITERS)
    return f"pbkdf2${_PBKDF2_ITERS}${salt.hex()}${digest.hex()}"


def verify_password(password: str, stored: str) -> bool:
    parts = stored.split("$")
    if len(parts) == 4:  # pbkdf2$<iters>$<salt>$<digest>
        _, iters_s, salt_hex, digest_hex = parts
        try:
            iters = int(iters_s)
        except ValueError:
            return False
    elif len(parts) == 3:  # legacy format, fixed original cost
        _, salt_hex, digest_hex = parts
        iters = _PBKDF2_LEGACY_ITERS
    else:
        return False
    digest = hashlib.pbkdf2_hmac(
        "sha256", password.encode(), bytes.fromhex(salt_hex), iters
    )
    return hmac.compare_digest(digest.hex(), digest_hex)


def _b64(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def _unb64(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def create_token(claims: dict, secret: str, ttl_s: int = 3600, now: _dt.datetime | None = None) -> str:
    """Signed compact token over JSON claims + expiry (create-token,
    auth.clj:11-19; HS256-shaped: payload.signature)."""
    # timezone-AWARE UTC: .timestamp() on a naive datetime is
    # interpreted as LOCAL time, skewing exp by the host's UTC offset —
    # tokens minted on a non-UTC host would be rejected (or over-valid)
    # by a UTC verifier sharing the secret (r9 review)
    now = now or _dt.datetime.now(_dt.timezone.utc)
    if now.tzinfo is None:
        now = now.replace(tzinfo=_dt.timezone.utc)
    payload = dict(claims, exp=int((now + _dt.timedelta(seconds=ttl_s)).timestamp()))
    body = _b64(json.dumps(payload, sort_keys=True).encode())
    sig = _b64(hmac.new(secret.encode(), body.encode(), hashlib.sha256).digest())
    return f"{body}.{sig}"


def verify_token(token: str, secret: str, now: _dt.datetime | None = None) -> dict | None:
    """Signature + expiry check (token-verify, auth.clj:20-27); returns
    the claims or None."""
    now = now or _dt.datetime.now(_dt.timezone.utc)
    if now.tzinfo is None:
        now = now.replace(tzinfo=_dt.timezone.utc)  # treat naive input as UTC
    try:
        body, sig = token.split(".")
    except ValueError:
        return None
    want = _b64(hmac.new(secret.encode(), body.encode(), hashlib.sha256).digest())
    if not hmac.compare_digest(sig, want):
        return None
    claims = json.loads(_unb64(body))
    if claims.get("exp", 0) < int(now.timestamp()):
        return None
    return claims


class UserRegistry:
    """User documents over the bitemporal store (auth.clj:56-115)."""

    def __init__(
        self,
        spark: SparkSession,
        secret: str,
        store: StoreRef | None = None,
        now_fn=None,
    ):
        self.spark = spark
        self.secret = secret
        self._now = now_fn or _dt.datetime.utcnow
        if store is None:
            empty = spark.createDataFrame([], _USER_SCHEMA)
            store = StoreRef(DocumentStore(empty, now_fn=self._now))
        self.ref = store

    # -- registration (new-user, auth.clj:90-100) -----------------------
    def add_user(
        self,
        user: str,
        password: str,
        email: str | None = None,
        roles: tuple[str, ...] = ("user",),
        display_name: str | None = None,
    ) -> dict | Invalid:
        if not user or not user.replace("-", "").replace("_", "").isalnum():
            return Invalid("invalid-name", {"user": user})
        doc = {
            "id": f"user/{user}",
            "user_name": user,
            "pass_hash": hash_password(password),
            "email": email,
            "roles": json.dumps(sorted(roles)),
            "display_name": display_name or user,
        }
        row = self.spark.createDataFrame(
            [tuple(doc.values())],
            "id string, user_name string, pass_hash string, email string, "
            "roles string, display_name string",
        )
        # duplicate registration rejected (auth.clj:93-96 checks the db
        # for an existing user doc before adding). The existence check
        # runs INSIDE the StoreRef swap so check and insert are atomic
        # under the store lock — two concurrent registrations for the
        # same name can't both pass the check and LWW-shadow each other
        # (ADVICE r2; same discipline as the alert scheduler's CAS).
        state = {"exists": False}

        def _apply(s):
            if s.entity(doc["id"]).limit(1).collect():
                state["exists"] = True
                return s
            return s.put(row, valid_time=self._now())

        self.ref.swap(_apply)
        if state["exists"]:
            return Invalid("user-exists", {"user": user})
        return doc

    # -- lookup (get-user, auth.clj:56-58 — B8 point lookup) ------------
    def get_user(self, user: str):
        rows = self.ref.store.entity(f"user/{user}").collect()
        return rows[0] if rows else None

    # -- login (check-cred → create-token, auth.clj:70-76) --------------
    def check_cred(self, user: str, password: str) -> str | None:
        row = self.get_user(user)
        if row is None or not verify_password(password, row.pass_hash):
            return None
        return create_token(
            {"user": row.user_name, "roles": json.loads(row.roles)},
            self.secret,
            now=self._now(),
        )

    # -- authorization (get-roles / make-authorize, auth.clj:28-55) -----
    def authorize(self, token: str, required_roles: tuple[str, ...]) -> bool:
        claims = verify_token(token, self.secret, now=self._now())
        if claims is None:
            return False
        return bool(set(required_roles) & set(claims.get("roles", ())))
