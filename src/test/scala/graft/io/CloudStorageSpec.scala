package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Cloud property-surface parity: reference-style FileIO properties
  * (opendal/src/{s3,gcs,azdls,oss,hf}.rs + resolving.rs dispatch)
  * translate to the Hadoop connector conf this engine executes with.
  * Offline by design — pure translation + URI parsing, no network. */
class CloudStorageSpec extends AnyFunSuite {
  import CloudStorage._

  test("scheme dispatch matches resolving.rs") {
    assert(schemeOf("s3://b/k") === "s3")
    assert(schemeOf("s3a://b/k") === "s3")
    assert(schemeOf("s3n://b/k") === "s3")
    assert(schemeOf("gs://b/k") === "gcs")
    assert(schemeOf("gcs://b/k") === "gcs")
    assert(schemeOf("oss://b/k") === "oss")
    assert(schemeOf("abfss://fs@acct.dfs.core.windows.net/p") === "azdls")
    assert(schemeOf("abfs://fs@acct.dfs.core.windows.net/p") === "azdls")
    assert(schemeOf("wasbs://c@a.blob.core.windows.net/p") === "azdls")
    assert(schemeOf("wasb://c@a.blob.core.windows.net/p") === "azdls")
    assert(schemeOf("hf://datasets/user/repo/f.parquet") === "hf")
    assert(schemeOf("file:///tmp/x") === "file")
    assert(schemeOf("/tmp/x") === "file")
    assert(schemeOf("memory://x") === "memory")
    val e = intercept[IllegalArgumentException] { schemeOf("ftp://h/x") }
    assert(e.getMessage.contains("Unsupported storage scheme"))
  }

  test("s3 properties map onto S3A keys") {
    val m = s3Conf(Map(
      S3Endpoint -> "https://minio.example:9000",
      S3AccessKeyId -> "AK", S3SecretAccessKey -> "SK",
      S3Region -> "eu-west-1",
      S3PathStyleAccess -> "true")).toMap
    assert(m("fs.s3a.endpoint") === "https://minio.example:9000")
    assert(m("fs.s3a.access.key") === "AK")
    assert(m("fs.s3a.secret.key") === "SK")
    assert(m("fs.s3a.endpoint.region") === "eu-west-1")
    assert(m("fs.s3a.path.style.access") === "true")
  }

  test("s3.region wins over client.region; client.region fills the gap") {
    val both = s3Conf(Map(S3Region -> "us-east-2", ClientRegion -> "ap-south-1")).toMap
    assert(both("fs.s3a.endpoint.region") === "us-east-2")
    val fallback = s3Conf(Map(ClientRegion -> "ap-south-1")).toMap
    assert(fallback("fs.s3a.endpoint.region") === "ap-south-1")
  }

  test("s3 session token / anonymous / assume-role choose the provider") {
    val tok = s3Conf(Map(S3AccessKeyId -> "AK", S3SecretAccessKey -> "SK",
      S3SessionToken -> "TOK")).toMap
    assert(tok("fs.s3a.session.token") === "TOK")
    assert(tok("fs.s3a.aws.credentials.provider")
      === "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")

    // anonymous outranks everything (s3.rs:109 skip_signature)
    val anon = s3Conf(Map(S3AllowAnonymous -> "TRUE", S3SessionToken -> "TOK")).toMap
    assert(anon("fs.s3a.aws.credentials.provider")
      === "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider")

    val role = s3Conf(Map(S3AssumeRoleArn -> "arn:aws:iam::1:role/r",
      S3AssumeRoleSessionName -> "sess", S3AssumeRoleExternalId -> "ext")).toMap
    assert(role("fs.s3a.assumed.role.arn") === "arn:aws:iam::1:role/r")
    assert(role("fs.s3a.assumed.role.session.name") === "sess")
    assert(role("fs.s3a.assumed.role.external.id") === "ext")
    assert(role("fs.s3a.aws.credentials.provider")
      === "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider")

    // static-keys-only mode when config/metadata loading is disabled
    val static = s3Conf(Map(S3AccessKeyId -> "AK", S3SecretAccessKey -> "SK",
      S3DisableConfigLoad -> "1")).toMap
    assert(static("fs.s3a.aws.credentials.provider")
      === "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
  }

  test("s3 SSE types translate; unknown type refused like s3.rs:98") {
    assert(s3Conf(Map(S3SseType -> "none")).toMap.get("fs.s3a.encryption.algorithm").isEmpty)
    assert(s3Conf(Map(S3SseType -> "s3")).toMap.apply("fs.s3a.encryption.algorithm") === "AES256")
    val kms = s3Conf(Map(S3SseType -> "KMS", S3SseKey -> "key-id")).toMap
    assert(kms("fs.s3a.encryption.algorithm") === "SSE-KMS")
    assert(kms("fs.s3a.encryption.key") === "key-id")
    val cust = s3Conf(Map(S3SseType -> "custom", S3SseKey -> "b64")).toMap
    assert(cust("fs.s3a.encryption.algorithm") === "SSE-C")
    val e = intercept[IllegalArgumentException] { s3Conf(Map(S3SseType -> "wat")) }
    assert(e.getMessage.contains("Expected one of (custom, kms, s3, none)"))
  }

  test("gcs properties map onto the GCS connector") {
    val m = gcsConf(Map(
      GcsProjectId -> "proj-1",
      GcsServicePath -> "https://storage.fake.example",
      GcsUserProject -> "bill-me")).toMap
    assert(m("fs.gs.project.id") === "proj-1")
    assert(m("fs.gs.storage.root.url") === "https://storage.fake.example")
    assert(m("fs.gs.requester.pays.project.id") === "bill-me")
    assert(gcsConf(Map(GcsNoAuth -> "true")).toMap.apply("fs.gs.auth.type") === "UNAUTHENTICATED")
    assert(gcsConf(Map(GcsAllowAnonymous -> "on")).toMap.apply("fs.gs.auth.type") === "UNAUTHENTICATED")
  }

  test("gcs credentials-json: path passthrough, raw and base64 JSON materialize") {
    assert(materializeKeyfile("/etc/keys/svc.json") === "/etc/keys/svc.json")
    val raw = """{"type":"service_account","project_id":"p"}"""
    val p1 = materializeKeyfile(raw)
    assert(p1.endsWith(".json") && p1 != raw)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(p1)) === raw)
    val b64 = java.util.Base64.getEncoder.encodeToString(
      raw.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val p2 = materializeKeyfile(b64)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(p2)) === raw)
    assert(p1 === p2, "same content dedupes to one temp file")
    val conf = gcsConf(Map(GcsCredentialsJson -> raw)).toMap
    assert(conf("fs.gs.auth.type") === "SERVICE_ACCOUNT_JSON_KEYFILE")
    assert(conf("fs.gs.auth.service.account.json.keyfile") === p1)
  }

  test("adls shared-key / SAS / OAuth map account-scoped ABFS keys") {
    val host = "myacct.dfs.core.windows.net"
    val key = adlsConf(Map(AdlsAccountName -> "myacct", AdlsAccountKey -> "K")).toMap
    assert(key(s"fs.azure.account.auth.type.$host") === "SharedKey")
    assert(key(s"fs.azure.account.key.$host") === "K")

    val sas = adlsConf(Map(AdlsAccountName -> "myacct", AdlsSasToken -> "sv=…")).toMap
    assert(sas(s"fs.azure.account.auth.type.$host") === "SAS")
    assert(sas(s"fs.azure.sas.fixed.token.$host") === "sv=…")

    val oauth = adlsConf(Map(AdlsAccountName -> "myacct",
      AdlsTenantId -> "tid", AdlsClientId -> "cid", AdlsClientSecret -> "sec")).toMap
    assert(oauth(s"fs.azure.account.auth.type.$host") === "OAuth")
    assert(oauth(s"fs.azure.account.oauth2.client.id.$host") === "cid")
    assert(oauth(s"fs.azure.account.oauth2.client.secret.$host") === "sec")
    assert(oauth(s"fs.azure.account.oauth2.client.endpoint.$host")
      === "https://login.microsoftonline.com/tid/oauth2/token")

    // custom authority host (adls.authority-host, azdls.rs:48)
    val sov = adlsConf(Map(AdlsAccountName -> "myacct", AdlsTenantId -> "tid",
      AdlsClientId -> "cid", AdlsClientSecret -> "sec",
      AdlsAuthorityHost -> "https://login.example.cn/")).toMap
    assert(sov(s"fs.azure.account.oauth2.client.endpoint.$host")
      === "https://login.example.cn/tid/oauth2/token")

    // connection string: same refusal as azdls.rs:44
    val e = intercept[UnsupportedOperationException] {
      adlsConf(Map(AdlsConnectionString -> "DefaultEndpointsProtocol=…"))
    }
    assert(e.getMessage.contains("connection string"))
  }

  test("oss properties map onto hadoop-aliyun") {
    val m = ossConf(Map(OssEndpoint -> "oss-cn-hangzhou.example.com",
      OssAccessKeyId -> "AK", OssAccessKeySecret -> "SK")).toMap
    assert(m("fs.oss.endpoint") === "oss-cn-hangzhou.example.com")
    assert(m("fs.oss.accessKeyId") === "AK")
    assert(m("fs.oss.accessKeySecret") === "SK")
  }

  test("configure() folds every scheme's keys into one Configuration") {
    val conf = CloudStorage.configure(Map(
      S3Endpoint -> "https://s3.example", GcsProjectId -> "p",
      OssEndpoint -> "oss.example",
      AdlsAccountName -> "a", AdlsAccountKey -> "K"))
    assert(conf.get("fs.s3a.endpoint") === "https://s3.example")
    assert(conf.get("fs.gs.project.id") === "p")
    assert(conf.get("fs.oss.endpoint") === "oss.example")
    assert(conf.get("fs.azure.account.key.a.dfs.core.windows.net") === "K")
    // alias scheme impls so s3:// and gs:// resolve without user conf
    assert(conf.get("fs.s3.impl") === "org.apache.hadoop.fs.s3a.S3AFileSystem")
    assert(conf.get("fs.gs.impl")
      === "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem")
    // FileIO.withProperties exposes the same thing
    assert(FileIO.withProperties(Map(S3AccessKeyId -> "AK"))
      .conf.get("fs.s3a.access.key") === "AK")
  }

  test("hf URI grammar parses per hf.rs:68") {
    assert(HfUri.parse("hf://datasets/user/repo/train/part-0.parquet")
      === Some(HfUri("datasets", "user/repo", None, "train/part-0.parquet")))
    // singular repo type accepted, canonicalized to plural
    assert(HfUri.parse("hf://dataset/user/repo")
      === Some(HfUri("datasets", "user/repo", None, "")))
    assert(HfUri.parse("hf://models/org/model@main/config.json")
      === Some(HfUri("models", "org/model", Some("main"), "config.json")))
    // URL-escaped revision
    assert(HfUri.parse("hf://datasets/u/r@refs%2Fconvert%2Fparquet/x/y.parquet")
      === Some(HfUri("datasets", "u/r", Some("refs/convert/parquet"), "x/y.parquet")))
    // multi-segment special refs split after the full ref
    assert(HfUri.parse("hf://datasets/u/r@refs/pr/7/data.parquet")
      === Some(HfUri("datasets", "u/r", Some("refs/pr/7"), "data.parquet")))
    // revision without path; bare repo; `@` later in the path is data
    assert(HfUri.parse("hf://models/org/model@v1")
      === Some(HfUri("models", "org/model", Some("v1"), "")))
    assert(HfUri.parse("hf://spaces/o/s") === Some(HfUri("spaces", "o/s", None, "")))
    assert(HfUri.parse("hf://datasets/u/r/path/@file")
      === Some(HfUri("datasets", "u/r", None, "path/@file")))
    // no implicit repo type; unknown prefix rejected
    assert(HfUri.parse("hf://user/repo/file") === None)
    assert(HfUri.parse("hf://") === None)
  }

  test("hf resolve URL honors endpoint and revision fallbacks") {
    val u = HfUri.parse("hf://datasets/user/repo/train/f.parquet").get
    assert(u.resolveUrl()
      === "https://huggingface.co/datasets/user/repo/resolve/main/train/f.parquet")
    assert(u.resolveUrl(Map(CloudStorage.HfEndpoint -> "https://hub.example/",
      CloudStorage.HfRevision -> "v2"))
      === "https://hub.example/datasets/user/repo/resolve/v2/train/f.parquet")
    // URI-pinned revision wins over the property fallback (hf.rs:190-196)
    val pinned = HfUri.parse("hf://datasets/user/repo@v9/f.parquet").get
    assert(pinned.resolveUrl(Map(CloudStorage.HfRevision -> "v2"))
      === "https://huggingface.co/datasets/user/repo/resolve/v9/f.parquet")
    // FileIO refuses hf:// as a filesystem with a pointer to the resolver
    val e = intercept[UnsupportedOperationException] {
      FileIO.local().fs("hf://datasets/user/repo/f.parquet")
    }
    assert(e.getMessage.contains("resolve/main/f.parquet"))
  }
}
