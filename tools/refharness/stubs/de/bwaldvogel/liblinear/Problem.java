package de.bwaldvogel.liblinear;

public class Problem {
  public int l;
  public int n;
  public double bias;
  public Feature[][] x;
  public double[] y;
}
