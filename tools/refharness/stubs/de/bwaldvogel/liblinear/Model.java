package de.bwaldvogel.liblinear;

public class Model implements java.io.Serializable {
  public int getNrClass() { throw new UnsupportedOperationException("liblinear stub"); }
  public int[] getLabels() { throw new UnsupportedOperationException("liblinear stub"); }
}
