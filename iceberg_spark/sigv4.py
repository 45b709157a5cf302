"""AWS Signature Version 4 request signing (pure stdlib).

Backs the REST adapter's remote-signing endpoint (`POST
/v1/aws/s3/sign`, the reference aws module's S3V4RestSignerClient /
s3-signer-open-api.yaml surface): a client with NO storage credentials
sends its intended S3 request (method, uri, headers) to the catalog,
which signs it with server-held credentials and returns the headers to
attach. The algorithm is public AWS documentation; the implementation
is pinned against the published SigV4 test vector in
tests/test_sigv4.py.
"""

from __future__ import annotations

import hashlib
import hmac
from urllib.parse import quote, urlsplit

EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()
UNSIGNED = "UNSIGNED-PAYLOAD"


def _uri_encode(s: str, encode_slash: bool = True) -> str:
    # AWS canonical encoding: unreserved chars [A-Za-z0-9-._~] stay;
    # everything else percent-encodes (space -> %20, never '+')
    safe = "-._~" + ("" if encode_slash else "/")
    return quote(s, safe=safe)


def canonical_query(query: str) -> str:
    if not query:
        return ""
    from urllib.parse import unquote

    pairs = []
    for part in query.split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        # the query arrives in WIRE form (urlsplit of the request URI):
        # values like S3 continuation-tokens already carry %2F etc.
        # Decode each name/value exactly once, then re-encode
        # canonically — the AWS SDK's SdkHttpUtils behavior. Encoding
        # the wire form as if raw would double-encode ('%2F'->'%252F')
        # and produce a signature real S3 rejects.
        pairs.append((_uri_encode(unquote(k)), _uri_encode(unquote(v))))
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def _canonical_headers(headers: dict) -> tuple[str, str]:
    """headers: name -> list[str] | str. Returns (canonical block,
    signed-headers list). Values trim + collapse internal spaces per
    the spec; names lowercase-sorted."""
    norm = {}
    for name, vals in headers.items():
        if isinstance(vals, str):
            vals = [vals]
        key = name.strip().lower()
        cleaned = [" ".join(str(v).split()) for v in vals]
        norm.setdefault(key, []).extend(cleaned)
    names = sorted(norm)
    block = "".join(f"{n}:{','.join(norm[n])}\n" for n in names)
    return block, ";".join(names)


def sign(method: str, uri: str, headers: dict, region: str,
         service: str, access_key: str, secret_key: str,
         body: bytes | None = None, session_token: str | None = None,
         amz_date: str | None = None) -> dict:
    """Sign one request; returns the headers to SET on it (the input
    headers are included in the signature but not returned). `headers`
    must already carry `host` (or it derives from the uri). For S3,
    an explicit x-amz-content-sha256 in `headers` wins; else the body
    hashes; else UNSIGNED-PAYLOAD (the remote-signing default — the
    signer never sees streamed data)."""
    parts = urlsplit(uri)
    hdrs = {k.lower(): (v if isinstance(v, list) else [v])
            for k, v in headers.items()}
    if "host" not in hdrs:
        hdrs["host"] = [parts.netloc]
    if amz_date is None:
        for v in hdrs.get("x-amz-date", []):
            amz_date = v
    if amz_date is None:
        import datetime as _dt

        amz_date = _dt.datetime.now(_dt.timezone.utc) \
            .strftime("%Y%m%dT%H%M%SZ")
    hdrs["x-amz-date"] = [amz_date]
    if session_token:
        hdrs["x-amz-security-token"] = [session_token]
    if "x-amz-content-sha256" in hdrs:
        payload_hash = hdrs["x-amz-content-sha256"][0]
    elif body is not None:
        payload_hash = hashlib.sha256(body).hexdigest()
        if service == "s3":  # S3 requires the content hash header
            hdrs["x-amz-content-sha256"] = [payload_hash]
    elif service == "s3":
        payload_hash = UNSIGNED
        hdrs["x-amz-content-sha256"] = [UNSIGNED]
    else:
        payload_hash = EMPTY_SHA256

    path = parts.path or "/"
    # S3 canonical path is the raw (already-encoded) path; other
    # services double-encode
    cpath = path if service == "s3" else _uri_encode(path,
                                                     encode_slash=False)
    cheaders, signed_names = _canonical_headers(hdrs)
    creq = "\n".join([
        method.upper(), cpath, canonical_query(parts.query),
        cheaders, signed_names, payload_hash])
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    sts = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        hashlib.sha256(creq.encode()).hexdigest()])

    def hm(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = hm(hm(hm(hm(b"AWS4" + secret_key.encode(), date), region),
               service), "aws4_request")
    sig = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
    auth = (f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
            f"SignedHeaders={signed_names}, Signature={sig}")
    out = {"Authorization": [auth], "x-amz-date": [amz_date]}
    if "x-amz-content-sha256" in hdrs:
        out["x-amz-content-sha256"] = hdrs["x-amz-content-sha256"]
    if session_token:
        out["x-amz-security-token"] = [session_token]
    return out


def verify(method: str, uri: str, headers: dict, authorization: str,
           secret_key: str, body: bytes | None = None) -> bool:
    """Recompute-and-compare check of a SigV4 Authorization header
    (test/validation aid — a real S3 endpoint does this server-side)."""
    try:
        cred = authorization.split("Credential=")[1].split(",")[0]
        access_key, date, region, service, _ = cred.split("/")
        signed = authorization.split("SignedHeaders=")[1].split(",")[0]
        keep = set(signed.split(";"))
        hdrs = {k: v for k, v in headers.items()
                if k.strip().lower() in keep}
        amz = None
        for k, v in headers.items():
            if k.strip().lower() == "x-amz-date":
                amz = v[0] if isinstance(v, list) else v
        got = sign(method, uri, hdrs, region, service, access_key,
                   secret_key, body=body, amz_date=amz)
        return hmac.compare_digest(got["Authorization"][0],
                                   authorization)
    except Exception:  # noqa: BLE001 — malformed header = not verified
        return False
