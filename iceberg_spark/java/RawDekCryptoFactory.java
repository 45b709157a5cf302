package org.iceberg_spark.crypto;

import java.util.Base64;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.Path;
import org.apache.parquet.crypto.DecryptionPropertiesFactory;
import org.apache.parquet.crypto.EncryptionPropertiesFactory;
import org.apache.parquet.crypto.FileDecryptionProperties;
import org.apache.parquet.crypto.FileEncryptionProperties;
import org.apache.parquet.crypto.ParquetCryptoRuntimeException;
import org.apache.parquet.hadoop.api.WriteSupport;

/** Raw-footer-key parquet modular encryption - the REFERENCE's native
 * data-file format (parquet/.../Parquet.java builds
 * FileEncryptionProperties.builder(dek).withAADPrefix(aad)
 * .withoutAADPrefixStorage() on write and FileDecryptionProperties
 * .builder().withFooterKey(dek).withAADPrefix(aad) on read; the DEK and
 * AAD prefix ride the manifest entry's StandardKeyMetadata blob, not a
 * KMS envelope inside the file). pyarrow exposes no raw-footer-key
 * surface, so imported reference-encrypted files read through Spark's
 * own parquet reader with this factory instead.
 *
 * Read: per-file DEKs resolve by FILE NAME from the per-relation conf,
 * "iceberg.spark.rawdek.read.&lt;basename&gt;" = hexDek[":"b64Aad];
 * a file with no entry fails loudly (never silently plaintext).
 * Write: one DEK per write job ("...write.key" hex + optional
 * "...write.aad" base64), matching the reference's writer layout. */
public class RawDekCryptoFactory
    implements DecryptionPropertiesFactory, EncryptionPropertiesFactory {

  public static final String READ_PREFIX = "iceberg.spark.rawdek.read.";
  public static final String WRITE_KEY = "iceberg.spark.rawdek.write.key";
  public static final String WRITE_AAD = "iceberg.spark.rawdek.write.aad";

  private static byte[] hex(String s) {
    int n = s.length() / 2;
    byte[] out = new byte[n];
    for (int i = 0; i < n; i++) {
      out[i] = (byte) Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16);
    }
    return out;
  }

  @Override
  public FileDecryptionProperties getFileDecryptionProperties(
      Configuration conf, Path filePath) throws ParquetCryptoRuntimeException {
    String name = filePath.getName();
    String spec = conf.getTrimmed(READ_PREFIX + name);
    if (spec == null) {
      throw new ParquetCryptoRuntimeException(
          "no raw DEK registered for encrypted parquet file " + name);
    }
    String[] parts = spec.split(":", 2);
    FileDecryptionProperties.Builder b =
        FileDecryptionProperties.builder().withFooterKey(hex(parts[0]));
    if (parts.length == 2 && !parts[1].isEmpty()) {
      b.withAADPrefix(Base64.getDecoder().decode(parts[1]));
    }
    return b.build();
  }

  @Override
  public FileEncryptionProperties getFileEncryptionProperties(
      Configuration conf, Path tempFilePath,
      WriteSupport.WriteContext fileWriteContext)
      throws ParquetCryptoRuntimeException {
    String hexKey = conf.getTrimmed(WRITE_KEY);
    if (hexKey == null) {
      throw new ParquetCryptoRuntimeException(
          "raw-DEK factory configured for write without " + WRITE_KEY);
    }
    FileEncryptionProperties.Builder b =
        FileEncryptionProperties.builder(hex(hexKey));
    String aad = conf.getTrimmed(WRITE_AAD);
    if (aad != null && !aad.isEmpty()) {
      b.withAADPrefix(Base64.getDecoder().decode(aad))
          .withoutAADPrefixStorage();
    }
    return b.build();
  }
}
