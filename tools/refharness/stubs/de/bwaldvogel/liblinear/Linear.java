package de.bwaldvogel.liblinear;

public class Linear {
  public static Model train(Problem problem, Parameter parameter) {
    throw new UnsupportedOperationException("liblinear stub: not available offline");
  }
  public static double predict(Model model, Feature[] x) {
    throw new UnsupportedOperationException("liblinear stub");
  }
  public static double predictProbability(Model model, Feature[] x, double[] probs) {
    throw new UnsupportedOperationException("liblinear stub");
  }
  public static void resetRandom() {}
  public static void disableDebugOutput() {}
}
