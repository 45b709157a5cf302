"""SigV4 remote signing: algorithm pinned to AWS's published test
vector, the /v1/aws/s3/sign endpoint (reference aws/.../s3/signer/
S3V4RestSignerClient.java + s3-signer-open-api.yaml), and the
verify-side recompute."""

import json
import urllib.request

import pytest

from iceberg_spark.sigv4 import EMPTY_SHA256, UNSIGNED, sign, verify

# the canonical AWS SigV4 example (GET iam ListUsers, 20150830)
AK = "AKIDEXAMPLE"
SK = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY"
IAM_URI = "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"
IAM_HEADERS = {
    "Content-Type": "application/x-www-form-urlencoded; charset=utf-8",
    "Host": "iam.amazonaws.com",
    "X-Amz-Date": "20150830T123600Z",
}
IAM_SIG = "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"


def test_sigv4_published_vector():
    out = sign("GET", IAM_URI, IAM_HEADERS, "us-east-1", "iam",
               AK, SK, body=b"")
    auth = out["Authorization"][0]
    assert auth == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/"
        "iam/aws4_request, SignedHeaders=content-type;host;x-amz-date, "
        f"Signature={IAM_SIG}")


def test_sigv4_s3_unsigned_payload_and_verify():
    hdrs = {"Host": "bucket.s3.amazonaws.com",
            "X-Amz-Date": "20240301T000000Z"}
    out = sign("GET", "https://bucket.s3.amazonaws.com/data/f.parquet"
               "?partNumber=2&uploadId=abc",
               hdrs, "us-west-2", "s3", AK, SK)
    assert out["x-amz-content-sha256"] == [UNSIGNED]
    all_h = dict(hdrs)
    all_h.update(out)
    assert verify("GET", "https://bucket.s3.amazonaws.com/data/f.parquet"
                  "?partNumber=2&uploadId=abc",
                  all_h, out["Authorization"][0], SK)
    # wrong secret fails closed
    assert not verify("GET", "https://bucket.s3.amazonaws.com/x",
                      all_h, out["Authorization"][0], "nope")


def test_sigv4_wire_encoded_query_not_double_encoded():
    """A wire-form query (what urlsplit yields from a real request URI)
    already carries percent-encoded reserved chars — S3
    continuation-tokens are the canonical case. Canonicalization must
    decode-once-then-re-encode (AWS SdkHttpUtils behavior), NOT encode
    the wire form again ('%2F' -> '%252F' breaks the signature)."""
    from iceberg_spark.sigv4 import canonical_query

    # wire form of list-type=2&continuation-token=a/b c&prefix=x%20y
    wire = "list-type=2&continuation-token=a%2Fb%20c&prefix=x%20y"
    cq = canonical_query(wire)
    assert cq == ("continuation-token=a%2Fb%20c&list-type=2"
                  "&prefix=x%20y")
    assert "%25" not in cq  # no double-encoding anywhere
    # raw (unencoded) queries — the published IAM vector's shape —
    # canonicalize identically through the decode-once path
    assert canonical_query("Action=ListUsers&Version=2010-05-08") == \
        "Action=ListUsers&Version=2010-05-08"
    # signatures over the two spellings of the same request agree
    h = {"Host": "b.s3.amazonaws.com", "X-Amz-Date": "20240301T000000Z"}
    a = sign("GET", "https://b.s3.amazonaws.com/k?prefix=x%20y", h,
             "us-east-1", "s3", AK, SK)
    b = sign("GET", "https://b.s3.amazonaws.com/k?prefix=x y", h,
             "us-east-1", "s3", AK, SK)
    assert a["Authorization"] == b["Authorization"]


def test_sigv4_body_hash():
    out = sign("PUT", "https://b.s3.amazonaws.com/k",
               {"Host": "b.s3.amazonaws.com",
                "X-Amz-Date": "20240301T000000Z"},
               "us-east-1", "s3", AK, SK, body=b"")
    assert out["x-amz-content-sha256"] == [EMPTY_SHA256]


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_rest_sign_endpoint(catalog, spark):
    from iceberg_spark.rest_catalog import serve

    srv, port = serve(catalog, signing_credentials=(AK, SK))
    try:
        st, res = _post(port, "/v1/aws/s3/sign", {
            "region": "us-east-1", "method": "GET",
            "uri": "https://bkt.s3.amazonaws.com/wh/t/data/00.parquet",
            "headers": {"Host": ["bkt.s3.amazonaws.com"],
                        "X-Amz-Date": ["20240301T000000Z"]}})
        assert st == 200
        assert res["uri"].endswith("00.parquet")
        auth = res["headers"]["Authorization"][0]
        assert auth.startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/")
        # the returned headers verify against the server's secret — the
        # client never saw it
        assert verify("GET", res["uri"], res["headers"], auth, SK)
        # missing field -> 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/v1/aws/s3/sign",
                  {"region": "us-east-1", "method": "GET"})
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_rest_sign_location_allowlist(catalog, spark):
    """signing_locations scopes the signer: URIs outside the allowed
    prefixes 403 (confused-deputy guard), boundary-safe — /wh/t1 must
    not authorize /wh/t10."""
    from iceberg_spark.rest_catalog import serve

    srv, port = serve(catalog, signing_credentials=(AK, SK),
                      signing_locations=["s3://bkt/wh/t1"])
    try:
        ok_body = {
            "region": "us-east-1", "method": "GET",
            "uri": "s3://bkt/wh/t1/data/00.parquet",
            "headers": {"Host": ["bkt.s3.amazonaws.com"],
                        "X-Amz-Date": ["20240301T000000Z"]}}
        st, res = _post(port, "/v1/aws/s3/sign", ok_body)
        assert st == 200
        assert res["headers"]["Authorization"][0].startswith(
            "AWS4-HMAC-SHA256")
        for bad in ("s3://bkt/wh/t10/data/00.parquet",  # sibling prefix
                    "s3://bkt/other/x",
                    "s3://evil/wh/t1/data/00.parquet"):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(port, "/v1/aws/s3/sign",
                      dict(ok_body, uri=bad))
            assert ei.value.code == 403
    finally:
        srv.shutdown()


def test_rest_sign_disabled_is_401(catalog, spark):
    from iceberg_spark.rest_catalog import serve

    srv, port = serve(catalog)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(port, "/v1/aws/s3/sign", {
                "region": "r", "method": "GET", "uri": "https://x/y",
                "headers": {}})
        assert ei.value.code == 401
    finally:
        srv.shutdown()
