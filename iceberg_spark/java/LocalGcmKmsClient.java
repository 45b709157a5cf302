package org.iceberg_spark.crypto;

import java.nio.charset.StandardCharsets;
import java.security.SecureRandom;
import java.util.Base64;
import javax.crypto.Cipher;
import javax.crypto.spec.GCMParameterSpec;
import javax.crypto.spec.SecretKeySpec;
import org.apache.hadoop.conf.Configuration;
import org.apache.parquet.crypto.keytools.KmsClient;

/** In-process KMS for parquet modular encryption: wrap/unwrap is
 * single-shot AES-GCM (nonce(12) || ciphertext || tag(16)) under a
 * master key supplied as hex in the Hadoop conf property
 * "iceberg.spark.kms.key.<master-key-id>", AAD = the key id - the
 * exact wrap format of the engine's pyarrow CryptoFactory KmsClient
 * (parquet_crypto._factory), so files written by either side unwrap
 * on the other. */
public class LocalGcmKmsClient implements KmsClient {
  private Configuration conf;

  @Override
  public void initialize(Configuration configuration, String kmsInstanceID,
      String kmsInstanceURL, String accessToken) {
    this.conf = configuration;
  }

  private byte[] masterKey(String keyId) {
    String hex = conf.getTrimmed("iceberg.spark.kms.key." + keyId);
    if (hex == null) {
      throw new IllegalStateException(
          "no master key registered for id " + keyId);
    }
    int n = hex.length() / 2;
    byte[] out = new byte[n];
    for (int i = 0; i < n; i++) {
      out[i] = (byte) Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16);
    }
    return out;
  }

  @Override
  public String wrapKey(byte[] key, String masterKeyIdentifier) {
    try {
      byte[] nonce = new byte[12];
      new SecureRandom().nextBytes(nonce);
      Cipher c = Cipher.getInstance("AES/GCM/NoPadding");
      c.init(Cipher.ENCRYPT_MODE,
          new SecretKeySpec(masterKey(masterKeyIdentifier), "AES"),
          new GCMParameterSpec(128, nonce));
      c.updateAAD(masterKeyIdentifier.getBytes(StandardCharsets.UTF_8));
      byte[] ct = c.doFinal(key);
      byte[] out = new byte[nonce.length + ct.length];
      System.arraycopy(nonce, 0, out, 0, nonce.length);
      System.arraycopy(ct, 0, out, nonce.length, ct.length);
      return Base64.getEncoder().encodeToString(out);
    } catch (Exception e) {
      throw new RuntimeException("KMS wrap failed", e);
    }
  }

  @Override
  public byte[] unwrapKey(String wrappedKey, String masterKeyIdentifier) {
    try {
      byte[] raw = Base64.getDecoder().decode(wrappedKey);
      Cipher c = Cipher.getInstance("AES/GCM/NoPadding");
      c.init(Cipher.DECRYPT_MODE,
          new SecretKeySpec(masterKey(masterKeyIdentifier), "AES"),
          new GCMParameterSpec(128, java.util.Arrays.copyOf(raw, 12)));
      c.updateAAD(masterKeyIdentifier.getBytes(StandardCharsets.UTF_8));
      return c.doFinal(java.util.Arrays.copyOfRange(raw, 12, raw.length));
    } catch (Exception e) {
      throw new RuntimeException("KMS unwrap failed (wrong key?)", e);
    }
  }
}
