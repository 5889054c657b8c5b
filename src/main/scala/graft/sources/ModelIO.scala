package graft.sources

import graft.correct.CompiledModel
import graft.wfst.Wfst
import java.io._
import java.nio.file.{Files, Paths}

/** A6 FST/model serialization (the reference uses OpenFst binary files,
  * lib/latticegen.py:201-206, scripts/train.py:153,183,213; we use Java
  * serialization of the CSR arrays with a format marker — model
  * artifacts are compiled once on the driver, written for reuse, and
  * broadcast at job start). */
object ModelIO {
  private val Magic = "GRAFT-WFST-1"

  def saveFst(fst: Wfst, path: String): Unit = {
    val out = new ObjectOutputStream(new BufferedOutputStream(
      Files.newOutputStream(Paths.get(path))))
    try { out.writeUTF(Magic); out.writeObject(fst) } finally out.close()
  }

  def loadFst(path: String): Wfst = {
    val in = new ObjectInputStream(new BufferedInputStream(
      Files.newInputStream(Paths.get(path))))
    try {
      val m = in.readUTF()
      require(m == Magic, s"bad fst file (magic=$m)")
      in.readObject().asInstanceOf[Wfst]
    } finally in.close()
  }

  def saveModel(model: CompiledModel, path: String): Unit = {
    val out = new ObjectOutputStream(new BufferedOutputStream(
      Files.newOutputStream(Paths.get(path))))
    try { out.writeUTF(Magic + "-MODEL"); out.writeObject(model) } finally out.close()
  }

  def loadModel(path: String): CompiledModel = {
    val in = new ObjectInputStream(new BufferedInputStream(
      Files.newInputStream(Paths.get(path))))
    try {
      val m = in.readUTF()
      require(m == Magic + "-MODEL", s"bad model file (magic=$m)")
      in.readObject().asInstanceOf[CompiledModel]
    } finally in.close()
  }
}
