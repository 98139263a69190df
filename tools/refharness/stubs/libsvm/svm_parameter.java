package libsvm;

public class svm_parameter implements java.io.Serializable {
  public static final int C_SVC = 0, NU_SVC = 1, ONE_CLASS = 2, EPSILON_SVR = 3, NU_SVR = 4;
  public static final int LINEAR = 0, POLY = 1, RBF = 2, SIGMOID = 3, PRECOMPUTED = 4;
  public int svm_type, kernel_type, degree;
  public double gamma, coef0, cache_size, eps, C, nu, p;
  public int shrinking, probability, nr_weight;
  public int[] weight_label;
  public double[] weight;
}
