package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Physics scalar kernels from the reference's Rust layer, re-expressed as pure
  * Catalyst column arithmetic — whole-stage-codegen'd, no UDF.
  */
object Physics {

  /** Von Mises stress from a 6-component Voigt stress tensor
    * (reference Rust `src/rust/src/d3plot/stress.rs:30`):
    * sqrt(((sxx-syy)^2 + (syy-szz)^2 + (szz-sxx)^2)/2 + 3(sxy^2+syz^2+szx^2)).
    */
  def vonMises(sxx: Column, syy: Column, szz: Column,
               sxy: Column, syz: Column, szx: Column): Column = {
    val dev = (pow(sxx - syy, 2) + pow(syy - szz, 2) + pow(szz - sxx, 2)) / 2.0
    val shear = (pow(sxy, 2) + pow(syz, 2) + pow(szx, 2)) * 3.0
    sqrt(dev + shear)
  }
}
