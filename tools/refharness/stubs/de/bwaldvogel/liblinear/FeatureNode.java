package de.bwaldvogel.liblinear;

public class FeatureNode implements Feature {
  public final int index;
  public double value;

  public FeatureNode(int index, double value) { this.index = index; this.value = value; }
  public int getIndex() { return index; }
  public double getValue() { return value; }
  public void setValue(double value) { this.value = value; }
}
