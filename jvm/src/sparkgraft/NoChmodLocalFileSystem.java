package sparkgraft;

import java.net.URI;

import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * A local Hadoop FileSystem for EPHEMERAL streaming checkpoints on
 * hosts without the native-hadoop library (libhadoop.so).
 *
 * Why it exists (measured, r16-r17): without NativeIO, every
 * RawLocalFileSystem file/dir creation that carries an FsPermission
 * falls back to FORKING a /bin/chmod per path
 * (FileUtil.setPermission -> Shell.runCommand). The catalog's
 * availableNow streaming runs checkpoint to per-query tmpdirs that
 * are never restored from, yet paid hundreds of fork+exec per run
 * (661 counted on the stream-stream interval join at sf0.1).
 *
 * This subclass no-ops setPermission -- the single funnel every
 * chmod in RawLocalFileSystem routes through (create(path, perm, ..)
 * and mkdirs(path, perm) both delegate to it) -- so checkpoint files
 * keep the JVM's umask-default permissions instead of paying a
 * process fork to set the same bits. It extends RawLocalFileSystem,
 * not LocalFileSystem, so no client-side .crc companion files are
 * written either (the checkpoints are already integrity-fenced by
 * Spark's own checksum manager knob; see streaming_queries.py).
 *
 * SCOPE: registered under the dedicated scheme `nochmod://` and used
 * ONLY for per-query ephemeral checkpoint dirs (single-writer, never
 * restored, deleted with the sandbox). Durable checkpoints must keep
 * a posix-faithful FileSystem: do not point fs.defaultFS or any
 * restorable path at this class.
 */
public class NoChmodLocalFileSystem extends RawLocalFileSystem {
  static final URI NAME = URI.create("nochmod:///");

  @Override
  public URI getUri() {
    return NAME;
  }

  @Override
  public String getScheme() {
    return "nochmod";
  }

  @Override
  public void setPermission(Path p, FsPermission permission) {
    // deliberate no-op: umask-default bits are correct for an
    // ephemeral single-user checkpoint dir, and the posix chmod
    // would cost a process fork per file without libhadoop
  }
}
