package libsvm;

public class svm {
  public static final java.util.Random rand = new java.util.Random();

  public static String svm_check_parameter(svm_problem p, svm_parameter param) { return null; }
  public static svm_model svm_train(svm_problem p, svm_parameter param) {
    throw new UnsupportedOperationException("libsvm stub: not available offline");
  }
  public static double svm_predict(svm_model model, svm_node[] x) {
    throw new UnsupportedOperationException("libsvm stub");
  }
  public static void svm_set_print_string_function(svm_print_interface f) {}
}
