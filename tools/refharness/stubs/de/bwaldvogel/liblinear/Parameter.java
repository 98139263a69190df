package de.bwaldvogel.liblinear;

public class Parameter {
  public Parameter(SolverType solver, double C, int maxIters, double eps) {}
  public Parameter(SolverType solver, double C, double eps) {}
  public Parameter(SolverType solver, double C, double eps, double p) {}
}
