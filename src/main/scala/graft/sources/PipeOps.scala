package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter, PrintWriter}
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.Dataset

/** E1-E3: partition-wise subprocess pipes — each partition streams its
  * records to a spawned process's stdin and reads transformed records from
  * stdout (the reference hand-rolls this with ProcessBuilder + pump
  * threads around flash/lighter/minimap2; here it is one generic operator).
  * Degrades gracefully: availability is probed with [[available]], so
  * pipelines feature-flag external tools instead of hard-failing.
  */
object PipeOps {

  /** True iff `cmd` can be started on this machine (probed cheaply). */
  def available(cmd: String): Boolean =
    try { new ProcessBuilder(cmd, "--version").start().destroy(); true }
    catch {
      case _: java.io.IOException =>
        try { new ProcessBuilder(cmd).start().destroy(); true }
        catch { case _: java.io.IOException => false }
    }

  /** Pipe each partition's lines through `cmd` (stdin -> stdout). A writer
    * thread pumps the input so producer and consumer never deadlock on the
    * pipe buffer. After stdout drains the subprocess is reaped and a
    * non-zero exit (or a writer-side IO error) fails the task — silent
    * truncation must never masquerade as success. */
  def pipePartitions(ds: Dataset[String], cmd: Seq[String]): Dataset[String] =
    pipePartitionsLazy(ds, () => cmd)

  /** As [[pipePartitions]], but the command line is assembled ON THE
    * EXECUTOR at partition start — for arguments that resolve
    * per-machine, e.g. a `SparkFiles`-shipped reference index path
    * ([[AlignerPipe]]). */
  def pipePartitionsLazy(ds: Dataset[String], cmdF: () => Seq[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it0 =>
      val cmd = cmdF()
      val it = it0.buffered
      if (!it.hasNext) Iterator.empty
      else {
        val proc = new ProcessBuilder(cmd: _*)
          .redirectError(ProcessBuilder.Redirect.INHERIT)
          .start()
        val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
        val writer = new Thread(() => {
          val w = new PrintWriter(new BufferedWriter(
            new OutputStreamWriter(proc.getOutputStream, UTF_8)))
          try it.foreach(w.println)
          catch { case t: Throwable => writerErr.set(t) }
          finally w.close()
        }, "graft-pipe-writer")
        writer.setDaemon(true)
        writer.start()
        val r = new BufferedReader(new InputStreamReader(proc.getInputStream, UTF_8))
        val out = Iterator.continually(r.readLine()).takeWhile(_ != null)
        def finish(): Iterator[String] = {
          r.close()
          writer.join()
          val rc = proc.waitFor()
          if (rc != 0)
            throw new java.io.IOException(s"pipe command '${cmd.head}' exited with $rc")
          val werr = writerErr.get()
          if (werr != null)
            throw new java.io.IOException(s"pipe writer failed for '${cmd.head}'", werr)
          Iterator.empty
        }
        out ++ finish()
      }
    }
  }
}
